"""Per-stage chained timing for the bf16 16Mi-float pipeline.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scratch/stage_bench.py [stages...]
Stages: split encode merge decode join compress decompress
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType, BLOCK_SIZE
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core, float_decompress_core,
)
from dietgpu_fork_tpu.models.ans import ans_encode_core, ans_decode_core
from dietgpu_fork_tpu.ops.float_split import split_hist_packed, join_packed
from dietgpu_fork_tpu.ops.histogram import histogram_packed
from dietgpu_fork_tpu.ops.table import (
    normalize_probs_batched, pack_encode_table, build_decode_table_batched,
)
from dietgpu_fork_tpu.ops.rans_encode import encode_blocks
from dietgpu_fork_tpu.ops.rans_decode import decode_blocks

N = 1 << 24
ITERS = 6
REPEATS = 4
I32 = jnp.int32
U32 = jnp.uint32


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chain_time(build):
    f1 = build(1)
    fk = build(ITERS)
    fence(f1())
    fence(fk())
    t1s, tks = [], []
    for _ in range(REPEATS):
        t0 = time.time(); fence(f1()); t1s.append(time.time() - t0)
        t0 = time.time(); fence(fk()); tks.append(time.time() - t0)
    return max((min(tks) - min(t1s)) / (ITERS - 1), 1e-9)


def report(name, dt, nbytes):
    print(f"{name:12s}: {dt*1e3:8.3f} ms   {nbytes/dt/1e9:7.2f} GB/s "
          f"(of {nbytes>>20} MiB)")
    sys.stdout.flush()


def main():
    stages = sys.argv[1:] or [
        "split", "encode", "decode", "join", "compress", "decompress"
    ]
    rng = np.random.default_rng(0)
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16
         ).astype(np.uint16)
    data32 = jnp.asarray(w.view(np.uint32).reshape(1, -1))
    sizes = jnp.array([N], jnp.int32)

    # precompute plane + tables on device
    planes, noncomp, hists = jax.jit(
        functools.partial(split_hist_packed, float_type=FloatType.BFLOAT16)
    )(data32, sizes)
    plane = jnp.asarray(np.asarray(planes[0]))
    hist = jnp.asarray(np.asarray(hists[0]))
    raw = jnp.asarray(np.asarray(noncomp[0]))

    if "split" in stages:
        def build(k):
            @jax.jit
            def f(d):
                out = None
                for i in range(k):
                    out = split_hist_packed(d, sizes, FloatType.BFLOAT16)
                    d = d.at[:, :1].set(d[:, :1] ^ out[0][0][:, :1] ^ U32(i))
                return out
            return lambda: f(data32)
        report("split+hist", chain_time(build), 2 * N)

    if "encode" in stages:
        def build(k):
            @jax.jit
            def f(p):
                pdf, cdf, magic, shift = normalize_probs_batched(
                    hist, sizes, 10)
                packed = pack_encode_table(pdf, cdf, shift)
                out = None
                for i in range(k):
                    out = encode_blocks(p, sizes, packed, magic, 10)
                    p = p.at[:, :1].set(p[:, :1] ^ out[1][:, 0, :1] ^ U32(i))
                return out
            return lambda: f(plane)
        report("encode_blk", chain_time(build), N)

    if "ans_full" in stages or "encode" in stages:
        def build(k):
            @jax.jit
            def f(p):
                out = None
                for i in range(k):
                    out = ans_encode_core(p, sizes, 10, hist=hist)
                    p = p.at[:, :1].set(p[:, :1] ^ out[0][:, :1] ^ U32(i))
                return out
            return lambda: f(plane)
        report("ans_enc_core", chain_time(build), N)

    # build an ANS archive of the plane for decode stages
    arch32, comp_bytes = jax.jit(
        lambda p: ans_encode_core(p, sizes, 10, hist=hist))(plane)
    arch32 = jnp.asarray(np.asarray(arch32))

    if "decode" in stages:
        def build(k):
            @jax.jit
            def f(c):
                out = None
                for i in range(k):
                    out = ans_decode_core(c, jnp.zeros((1,), I32), N, 10)
                    c = c.at[:, -1:].set(out[0][:, :1] + U32(i))
                return out
            return lambda: f(arch32)
        report("ans_dec_core", chain_time(build), N)

    if "join" in stages:
        def build(k):
            @jax.jit
            def f(p):
                out = None
                for i in range(k):
                    out = join_packed([p], [raw], FloatType.BFLOAT16)
                    p = p.at[:, :1].set(p[:, :1] ^ out[:, :1] ^ U32(i))
                return out
            return lambda: f(plane)
        report("join", chain_time(build), 2 * N)

    if "compress" in stages:
        def build(k):
            @jax.jit
            def f(d):
                out = None
                for i in range(k):
                    out = float_compress_core(d, sizes, FloatType.BFLOAT16, 10)
                    d = d.at[:, :1].set(d[:, :1] ^ out[0][:, :1] ^ U32(i))
                return out
            return lambda: f(data32)
        report("compress", chain_time(build), 2 * N)

    comp32, cb = jax.jit(lambda d: float_compress_core(
        d, sizes, FloatType.BFLOAT16, 10))(data32)
    comp32 = jnp.asarray(np.asarray(comp32))
    print("ratio:", int(np.asarray(cb)[0]) / (2 * N))

    if "decompress" in stages:
        def build(k):
            @jax.jit
            def f(c):
                out = None
                for i in range(k):
                    out = float_decompress_core(
                        c, jnp.zeros((1,), I32), N, FloatType.BFLOAT16, 10)
                    c = c.at[:, -1:].set(out[0][:, :1] + U32(i))
                return out
            return lambda: f(comp32)
        report("decompress", chain_time(build), 2 * N)


if __name__ == "__main__":
    main()
