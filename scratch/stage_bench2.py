"""Stage breakdown v2 for 16Mi bf16: finds non-kernel glue costs."""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core, float_decompress_core)
from dietgpu_fork_tpu.models.ans import ans_encode_core, ans_decode_core
from dietgpu_fork_tpu.ops.float_split import split_hist_packed
from dietgpu_fork_tpu.ops.histogram import histogram_packed
from dietgpu_fork_tpu.ops.table import (
    normalize_probs_batched, pack_encode_table)
from dietgpu_fork_tpu.ops.rans_encode import encode_blocks, MAX_BLOCK_WORDS32
import dietgpu_fork_tpu.ops.pallas.rans_decode_fused2 as rdf2

N = 1 << 24
ITERS = 5
REPEATS = 3
I32 = jnp.int32
U32 = jnp.uint32


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chain_time(build):
    f1, fk = build(1), build(ITERS)
    fence(f1()); fence(fk())
    t1s, tks = [], []
    for _ in range(REPEATS):
        t0 = time.time(); fence(f1()); t1s.append(time.time() - t0)
        t0 = time.time(); fence(fk()); tks.append(time.time() - t0)
    return max((min(tks) - min(t1s)) / (ITERS - 1), 1e-9)


def report(name, dt, nbytes):
    print(f"{name:14s}: {dt*1e3:8.3f} ms  {nbytes/dt/1e9:7.2f} GB/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16
         ).astype(np.uint16)
    data32 = jnp.asarray(w.view(np.uint32).reshape(1, -1))
    sizes = jnp.array([N], jnp.int32)

    planes, noncomp, hists, _cs = jax.jit(functools.partial(
        split_hist_packed, float_type=FloatType.BFLOAT16))(data32, sizes)
    plane = jnp.asarray(np.asarray(planes[0]))
    hist = jnp.asarray(np.asarray(hists[0]))

    def build_split(k):
        @jax.jit
        def f(d):
            out = None
            for i in range(k):
                out = split_hist_packed(d, sizes, FloatType.BFLOAT16)
                d = d.at[:, :1].set(d[:, :1] ^ out[0][0][:, :1] ^ U32(i))
            return out
        return lambda: f(data32)
    report("split+hist", chain_time(build_split), 2 * N)

    def build_enc_core(k):
        @jax.jit
        def f(p):
            out = None
            for i in range(k):
                out = ans_encode_core(p, sizes, 10, hist=hist)
                p = p.at[:, :1].set(p[:, :1] ^ out[0][:, :1] ^ U32(i))
            return out
        return lambda: f(plane)
    report("ans_enc_core", chain_time(build_enc_core), N)

    pdf, cdf, magic, shift = jax.jit(
        lambda h, s: normalize_probs_batched(h, s, 10))(hist, sizes)
    packed = jnp.asarray(np.asarray(pack_encode_table(pdf, cdf, shift)))
    magic = jnp.asarray(np.asarray(magic))

    def build_encblk(k):
        @jax.jit
        def f(p):
            out = None
            for i in range(k):
                out = encode_blocks(p, sizes, packed, magic, 10)
                p = p.at[:, :1].set(p[:, :1] ^ out[1][:, 0, :1] ^ U32(i))
            return out
        return lambda: f(plane)
    report("encode_blocks", chain_time(build_encblk), N)

    def build_comp(k):
        @jax.jit
        def f(d):
            out = None
            for i in range(k):
                out = float_compress_core(d, sizes, FloatType.BFLOAT16, 10)
                d = d.at[:, :1].set(d[:, :1] ^ out[0][:, :1] ^ U32(i))
            return out
        return lambda: f(data32)
    report("compress", chain_time(build_comp), 2 * N)

    arch32, cb = jax.jit(
        lambda p: ans_encode_core(p, sizes, 10, hist=hist))(plane)
    arch32 = jnp.asarray(np.asarray(arch32))

    def build_dec_core(k):
        @jax.jit
        def f(c):
            out = None
            for i in range(k):
                out = ans_decode_core(c, jnp.zeros((1,), I32), N, 10)
                c = c.at[:, -1:].set(out[0][:, :1] + U32(i))
            return out
        return lambda: f(arch32)
    report("ans_dec_core", chain_time(build_dec_core), N)

    # _stage transpose alone
    NB = -(-N // 4096)
    SW = -(-(MAX_BLOCK_WORDS32 + 8) // 32) * 32
    ea = jnp.asarray(
        rng.integers(0, 2**32, (1, NB, SW), dtype=np.uint64).astype(np.uint32))
    cwa = jnp.asarray(rng.integers(300, 700, (1, NB)).astype(np.int32))
    uwa = jnp.full((1, NB), 4096, jnp.int32)
    sta = jnp.asarray(
        rng.integers(0, 2**31, (1, NB, 32), dtype=np.uint64).astype(np.uint32))

    def build_stage(k):
        @jax.jit
        def f(e):
            out = None
            for i in range(k):
                out = rdf2._stage(e, cwa, uwa, sta, 256)
                e = e.at[0, 0, :1].set(out[0][0, 0, 0, :1] + U32(i))
            return out[0]
        return lambda: f(ea)
    report("stage_tposes", chain_time(build_stage), NB * SW * 4)

    comp32, cb = jax.jit(lambda d: float_compress_core(
        d, sizes, FloatType.BFLOAT16, 10))(data32)
    comp32 = jnp.asarray(np.asarray(comp32))

    def build_dec(k):
        @jax.jit
        def f(c):
            out = None
            for i in range(k):
                out = float_decompress_core(
                    c, jnp.zeros((1,), I32), N, FloatType.BFLOAT16, 10)
                c = c.at[:, -1:].set(out[0][:, :1] + U32(i))
            return out
        return lambda: f(comp32)
    report("decompress", chain_time(build_dec), 2 * N)


if __name__ == "__main__":
    main()
