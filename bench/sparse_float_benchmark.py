"""Sparse float codec sweep, CSV-compatible with the reference's
sparse_float_benchmark (float/SparseFloatBenchmark.cu:421-449).

CSV columns: float_type, prob_bits, num_batches, million_floats, sparsity,
comp_bandwidth_gbps, decomp_bandwidth_gbps. 50% exact zeros over N(0,1),
probBits 9, round-trip asserted.

Usage: python bench/sparse_float_benchmark.py [--sizes 0.1,1,15]
       [--batches 1,3,5]
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from dietgpu_fork_tpu.core.constants import FLOAT_WORD_SIZE, FloatType
from dietgpu_fork_tpu.api.codec import _default_native
from dietgpu_fork_tpu.models.sparse import (
    sparse_float_compress_core,
    sparse_float_decompress_core,
)

# r4: archives use the TPU-default layout (row-stream native on chip,
# classic elsewhere); override with DIETTPU_NATIVE=0/1
NATIVE = _default_native()

ITERS = 4
REPEATS = 3


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def sparse_words(rng, ft, n, sparsity=0.5):
    x = rng.normal(0, 1, n)
    x[rng.random(n) < sparsity] = 0.0
    if ft == FloatType.FLOAT16:
        w = x.astype(np.float16).view(np.uint16)
        return np.pad(w, (0, n % 2)).view(np.uint32)
    if ft == FloatType.BFLOAT16:
        w = (x.astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
        return np.pad(w, (0, n % 2)).view(np.uint32)
    if ft == FloatType.FLOAT32:
        return x.astype(np.float32).view(np.uint32)
    return x.astype(np.float64).view(np.uint32)


def bench_one(ft, n, bs, prob_bits, sparsity=0.5):
    rng = np.random.default_rng(99)
    ws = FLOAT_WORD_SIZE[ft]
    rows = [sparse_words(rng, ft, n, sparsity) for _ in range(bs)]
    data32 = jnp.asarray(np.stack(rows))
    sizes = jnp.full((bs,), n, jnp.int32)
    raw_gb = bs * n * ws / 1e9

    def enc(d):
        return sparse_float_compress_core(
            d, sizes, ft, prob_bits=prob_bits, native=NATIVE
        )

    comp32, comp_bytes = jax.jit(enc)(data32)
    comp32 = jnp.array(np.asarray(comp32))

    def dec(c):
        return sparse_float_decompress_core(
            c, n, ft, prob_bits=prob_bits, native=NATIVE
        )

    out = jax.jit(dec)(comp32)
    got = np.asarray(out[0]).view(np.uint8)[:, : n * ws]
    exp = np.asarray(data32).view(np.uint8)[:, : n * ws]
    assert np.array_equal(got, exp), f"sparse round-trip failed {ft} {n}"

    def chain(f, x0, perturb, k):
        # fori_loop chain: compile cost O(1) in k, loop-carried dependence
        # still defeats CSE/pipelining (see bench/float_benchmark.py)
        if k == 1:
            g = jax.jit(f)
            return lambda: g(x0)

        @jax.jit
        def g(x):
            out0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(f, x)
            )

            def body(i, carry):
                xc, _ = carry
                out = f(xc)
                return perturb(xc, out, i), out

            _, out = jax.lax.fori_loop(0, k, body, (x, out0))
            return out

        return lambda: g(x0)

    def p_enc(d, out, i):
        return d.at[:, :1].set(d[:, :1] ^ out[0][:, :1] ^ jnp.uint32(i))

    def p_dec(c, out, i):
        return c.at[:, -1:].set(out[0][:, :1] + jnp.uint32(i))

    iters = min(64, max(ITERS, (1 << 24) // max(n * bs, 1) + 1))
    def t_of(f1, fk):
        fence(f1()); fence(fk())
        t1s, tks = [], []
        for _ in range(REPEATS):
            t0 = time.time(); fence(f1()); t1s.append(time.time() - t0)
            t0 = time.time(); fence(fk()); tks.append(time.time() - t0)
        # chain-minus-single removes dispatch overhead, but if contention
        # inflates every single-call sample while one chain sample lands in
        # a quiet window the difference collapses and the bandwidth reads
        # absurdly high. t_chain/(k+1) is an honest floor: per-iter time is
        # (t_chain - dispatch)/k and dispatch >= 0.
        return max(
            (min(tks) - min(t1s)) / (iters - 1),
            min(tks) / (iters + 1),
            2e-6,
        )

    t_enc = t_of(chain(enc, data32, p_enc, 1), chain(enc, data32, p_enc, iters))
    t_dec = t_of(chain(dec, comp32, p_dec, 1), chain(dec, comp32, p_dec, iters))
    return raw_gb / t_enc, raw_gb / t_dec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="0.1,1,15")
    ap.add_argument("--batches", default="1,3,5")
    ap.add_argument("--probbits", type=int, default=9)
    ap.add_argument(
        "--types", default="float16,bfloat16,float32,float64"
    )
    args = ap.parse_args()
    names = {
        "float16": FloatType.FLOAT16, "bfloat16": FloatType.BFLOAT16,
        "float32": FloatType.FLOAT32, "float64": FloatType.FLOAT64,
    }

    print(
        "float_type,prob_bits,num_batches,million_floats,sparsity,"
        "comp_bandwidth_gbps,decomp_bandwidth_gbps"
    )
    # type-INNERMOST with sizes as given: on a shared chip the sweep can be
    # cut short, and this order completes full-dtype coverage config by
    # config instead of finishing one dtype before touching the next
    for bs in [int(b) for b in args.batches.split(",")]:
        for mf in [float(s) for s in args.sizes.split(",")]:
            for ft in [names[t] for t in args.types.split(",")]:
                n = int(mf * 1e6)
                cbw, dbw = bench_one(ft, n, bs, args.probbits)
                print(
                    f"{ft.name.lower()},{args.probbits},{bs},{mf},0.5,"
                    f"{cbw:.3f},{dbw:.3f}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
