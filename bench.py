"""Headline benchmark: bf16 float codec round trip on one TPU chip.

Protocol mirrors the reference's benchmark.py (N(0,1) data, warmup + 3 timed
runs) on its non-batched configuration. Prints exactly ONE JSON line on
stdout:

  {"metric": "float_bf16_codec_geomean_gbps", "value": <geomean of
   compress/decompress GB/s>, "unit": "GB/s", "vs_baseline": <value / 250>}

Baseline: the reference reports ~250-600 GB/s for the float codec on an
A100 (README.md:36); vs_baseline is measured against the 250 GB/s low end.

Timing note: on tunneled TPU runtimes block_until_ready can return before
execution finishes, so every measurement is fenced by a small
device-to-host copy, and per-iteration time is (K iters + fence) minus
(1 iter + fence) over K-1.
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
ITERS = 4


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:1])


def timed(f, *args):
    r = f(*args)
    fence(r)  # warmup/compile
    t0 = time.time()
    fence(f(*args))
    t_one = time.time() - t0
    t0 = time.time()
    r = None
    for _ in range(ITERS):
        r = f(*args)
    fence(r)
    t_many = time.time() - t0
    return max((t_many - t_one) / (ITERS - 1), 1e-9)


def main():
    rng = np.random.default_rng(0)
    w = (
        rng.normal(0, 1, N_FLOATS).astype(np.float32).view(np.uint32) >> 16
    ).astype(np.uint16)
    data32 = jnp.asarray(w.view(np.uint32).reshape(1, -1))
    sizes = jnp.array([N_FLOATS], jnp.int32)
    raw_gb = 2 * N_FLOATS / 1e9

    enc = jax.jit(
        float_compress_core,
        static_argnames=("float_type", "prob_bits", "use_checksum"),
    )
    dec = jax.jit(
        float_decompress_core,
        static_argnames=("out_floats", "float_type", "prob_bits"),
    )

    t_enc = timed(
        lambda d, s: enc(d, s, float_type=FloatType.BFLOAT16, prob_bits=10),
        data32,
        sizes,
    )
    comp32, comp_bytes = enc(
        data32, sizes, float_type=FloatType.BFLOAT16, prob_bits=10
    )
    ratio = int(np.asarray(comp_bytes)[0]) / (2 * N_FLOATS)

    zeros = jnp.zeros((1,), jnp.int32)
    t_dec = timed(
        lambda c, z: dec(
            c, z, out_floats=N_FLOATS, float_type=FloatType.BFLOAT16,
            prob_bits=10,
        ),
        comp32,
        zeros,
    )

    # round-trip correctness gate: a fast wrong codec scores zero
    out = dec(
        comp32, zeros, out_floats=N_FLOATS, float_type=FloatType.BFLOAT16,
        prob_bits=10,
    )
    ok = np.array_equal(
        np.asarray(out[0]).view(np.uint8)[0, : 2 * N_FLOATS], w.view(np.uint8)
    ) and bool(np.asarray(out[1])[0])

    comp_bw = raw_gb / t_enc
    decomp_bw = raw_gb / t_dec
    geo = float(np.sqrt(comp_bw * decomp_bw)) if ok else 0.0

    print(
        f"bf16 {N_FLOATS} floats: comp {comp_bw:.2f} GB/s, "
        f"decomp {decomp_bw:.2f} GB/s, ratio {ratio:.4f}, roundtrip={ok}",
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
