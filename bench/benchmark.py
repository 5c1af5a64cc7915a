"""PyTorch-protocol benchmark: both reference configurations
(dietgpu/benchmark.py:151-223) — non-batched and large-batch — for
bf16/fp16/fp32 N(0,1) data. Prints the reference's human-readable style:
comp/decomp time, bandwidth, and ratio per configuration.

Usage: python bench/benchmark.py [--floats 16777216] [--batch 128]
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
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core,
    float_decompress_core,
)

# r4: archives use the TPU-default layout (row-stream native on chip,
# classic elsewhere); override with DIETTPU_NATIVE=0/1
NATIVE = _default_native()

ITERS = 6
REPEATS = 3


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def rows_of(rng, ft, bs, n):
    x = rng.normal(0, 1, (bs, n))
    if ft == FloatType.FLOAT16:
        w = x.astype(np.float16).view(np.uint16)
        return np.pad(w, ((0, 0), (0, n % 2))).view(np.uint32)
    if ft == FloatType.BFLOAT16:
        w = (x.astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
        return np.pad(w, ((0, 0), (0, n % 2))).view(np.uint32)
    return x.astype(np.float32).view(np.uint32)


def bench(ft, bs, n, prob_bits=10):
    rng = np.random.default_rng(7)
    ws = FLOAT_WORD_SIZE[ft]
    data32 = jnp.asarray(rows_of(rng, ft, bs, n))
    sizes = jnp.full((bs,), n, jnp.int32)
    raw_gb = bs * n * ws / 1e9

    def enc(d):
        return float_compress_core(
            d, sizes, ft, prob_bits=prob_bits, native=NATIVE
        )

    comp32, comp_bytes = jax.jit(enc)(data32)
    comp32 = jnp.array(np.asarray(comp32))

    def dec(c):
        return float_decompress_core(
            c, jnp.zeros((bs,), jnp.int32), n, ft, prob_bits=prob_bits,
            native=NATIVE,
        )

    out = jax.jit(dec)(comp32)
    got = np.asarray(out[0]).view(np.uint8)[:, : n * ws]
    exp = np.asarray(data32).view(np.uint8)[:, : n * ws]
    assert np.array_equal(got, exp) and bool(np.all(np.asarray(out[1])))

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
                o = f(xc)
                return perturb(xc, o, i), o

            _, o = jax.lax.fori_loop(0, k, body, (x, out0))
            return o

        return lambda: g(x0)

    def p_enc(d, o, i):
        return d.at[:, :1].set(d[:, :1] ^ o[0][:, :1] ^ jnp.uint32(i))

    def p_dec(c, o, i):
        return c.at[:, -1:].set(o[0][:, :1] + jnp.uint32(i))

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

    t_e = t_of(chain(enc, data32, p_enc, 1), chain(enc, data32, p_enc, iters))
    t_d = t_of(chain(dec, comp32, p_dec, 1), chain(dec, comp32, p_dec, iters))
    ratio = int(np.asarray(comp_bytes).sum()) / (bs * n * ws)
    return t_e, t_d, raw_gb, ratio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--floats", type=int, default=1 << 24)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    names = {
        FloatType.BFLOAT16: "bfloat16",
        FloatType.FLOAT16: "float16",
        FloatType.FLOAT32: "float32",
    }
    for ft, name in names.items():
        for bs, n in [(1, args.floats), (args.batch, args.floats // args.batch)]:
            t_e, t_d, gb, ratio = bench(ft, bs, n)
            print(
                f"{name} bs={bs} x {n} floats: "
                f"comp {t_e*1e3:.2f} ms ({gb/t_e:.2f} GB/s), "
                f"decomp {t_d*1e3:.2f} ms ({gb/t_d:.2f} GB/s), "
                f"ratio {ratio:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
