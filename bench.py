"""Headline benchmark: bf16 float codec round trip on one TPU chip.

Protocol mirrors the reference's benchmark.py (N(0,1) data, warmup + timed
runs) on its non-batched configuration, using the ROW-STREAM native archive
layout — the library's default for TPU-produced archives (classic 0xD00D
stays available for bit-parity with the CUDA reference). Prints exactly ONE
JSON line on stdout:

  {"metric": "float_bf16_codec_geomean_gbps", "value": <geomean of
   compress/decompress GB/s>, "unit": "GB/s", "vs_baseline": <value / 250>}

Baseline: the reference reports ~250-600 GB/s for the float codec on an
A100 (README.md:36); vs_baseline is measured against the 250 GB/s low end.

Timing notes for the tunneled TPU runtime: (a) block_until_ready can
return before execution finishes, so measurements are fenced with a
device-to-host copy; (b) per-call dispatch overhead is large and noisy, so
each measurement chains ITERS dependent codec invocations inside ONE jit
(iteration i's input is perturbed by iteration i-1's output, preventing
CSE) and the per-iteration time is (chain - single) / (ITERS - 1);
(c) the chip is SHARED and contention comes in multi-second windows, so
sampling is spread over ROUNDS passes separated by short sleeps, each pass
interleaving the compress and decompress chains, taking the min of each
chain independently (dispatch noise is one-sided) before subtracting.
Per-round samples and the enc+dec stage sum go to stderr as a sanity
cross-check against the headline.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core,
    float_decompress_core,
)

N_FLOATS = 1 << 24  # 16Mi bf16 floats = 32 MiB
ITERS = 8
ROUNDS = 4  # sampling passes, sleep-separated to dodge contention windows
REPEATS = 3  # chain timings per pass
NATIVE = True  # ROW-STREAM archive layout (the TPU<->TPU default)


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:1])


def main():
    rng = np.random.default_rng(0)
    w = (
        rng.normal(0, 1, N_FLOATS).astype(np.float32).view(np.uint32) >> 16
    ).astype(np.uint16)
    data32 = jnp.asarray(w.view(np.uint32).reshape(1, -1))
    sizes = jnp.array([N_FLOATS], jnp.int32)
    raw_gb = 2 * N_FLOATS / 1e9

    def enc(d):
        return float_compress_core(
            d, sizes, FloatType.BFLOAT16, prob_bits=10, native=NATIVE
        )

    def dec(c):
        return float_decompress_core(
            c, jnp.zeros((1,), jnp.int32), N_FLOATS, FloatType.BFLOAT16,
            prob_bits=10, native=NATIVE,
        )

    def enc_chain(k):
        @jax.jit
        def f(d):
            out = None
            for i in range(k):
                out = enc(d)
                d = d.at[:, :1].set(d[:, :1] ^ out[0][:, :1] ^ jnp.uint32(i))
            return out
        return lambda: f(data32)

    comp32, comp_bytes = jax.jit(enc)(data32)
    comp32 = jnp.array(np.asarray(comp32))

    def dec_chain(k):
        @jax.jit
        def f(c):
            out = None
            for i in range(k):
                out = dec(c)
                # poke the (zero-padded) row tail, past the archive end:
                # serializes iterations without touching archive bytes
                c = c.at[:, -1:].set(out[0][:, :1] + jnp.uint32(i))
            return out
        return lambda: f(comp32)

    chains = {
        "enc": (enc_chain(1), enc_chain(ITERS)),
        "dec": (dec_chain(1), dec_chain(ITERS)),
    }
    # compile + warm every chain before any timing
    for f1, fk in chains.values():
        fence(f1())
        fence(fk())

    t1 = {k: [] for k in chains}
    tk = {k: [] for k in chains}
    for rnd in range(ROUNDS):
        for _ in range(REPEATS):
            for k, (f1, fk) in chains.items():
                t0 = time.time()
                fence(f1())
                t1[k].append(time.time() - t0)
                t0 = time.time()
                fence(fk())
                tk[k].append(time.time() - t0)
        per = {
            k: (min(tk[k]) - min(t1[k])) / (ITERS - 1) for k in chains
        }
        print(
            f"round {rnd}: enc {1e3 * per['enc']:.2f} ms, "
            f"dec {1e3 * per['dec']:.2f} ms (running mins)",
            file=sys.stderr,
        )
        if rnd + 1 < ROUNDS:
            time.sleep(2.0)

    # chain-minus-single removes dispatch overhead, but if contention
    # inflates every single-call sample while one chain sample lands in a
    # quiet window the difference collapses and bandwidth reads absurdly
    # high. t_chain/(ITERS+1) is an honest floor: per-iter time is
    # (t_chain - dispatch)/ITERS and dispatch >= 0.
    t_enc = max(
        (min(tk["enc"]) - min(t1["enc"])) / (ITERS - 1),
        min(tk["enc"]) / (ITERS + 1),
        1e-9,
    )
    t_dec = max(
        (min(tk["dec"]) - min(t1["dec"])) / (ITERS - 1),
        min(tk["dec"]) / (ITERS + 1),
        1e-9,
    )

    ratio = int(np.asarray(comp_bytes)[0]) / (2 * N_FLOATS)

    # round-trip correctness gate: a fast wrong codec scores zero
    out = jax.jit(dec)(comp32)
    ok = np.array_equal(
        np.asarray(out[0]).view(np.uint8)[0, : 2 * N_FLOATS], w.view(np.uint8)
    ) and bool(np.asarray(out[1])[0])

    comp_bw = raw_gb / t_enc
    decomp_bw = raw_gb / t_dec
    geo = float(np.sqrt(comp_bw * decomp_bw)) if ok else 0.0

    print(
        f"bf16 {N_FLOATS} floats (native={NATIVE}): comp {comp_bw:.2f} GB/s, "
        f"decomp {decomp_bw:.2f} GB/s, ratio {ratio:.4f}, roundtrip={ok}; "
        f"stage sum {1e3 * (t_enc + t_dec):.2f} ms/round-trip",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "float_bf16_codec_geomean_gbps",
                "value": round(geo, 3),
                "unit": "GB/s",
                "vs_baseline": round(geo / 250.0, 5),
            }
        )
    )


if __name__ == "__main__":
    main()
