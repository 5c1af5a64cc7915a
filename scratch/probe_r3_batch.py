"""Round-3 probe: per-stage compress cost at bs=1 vs bs=128, equal bytes.

Finds where the batched protocol (128 x 128Ki bf16) still pays more than
bs=1 x 16Mi after the flat-cell kernels. Stages: split+hist, table build,
encode_blocks (A+B), archive assembly merge, whole compress; decompress:
parse+stage, whole decompress.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scratch/probe_r3_batch.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core, float_decompress_core)
from dietgpu_fork_tpu.models.ans import ans_encode_core, ans_decode_core
from dietgpu_fork_tpu.ops.float_split import split_hist_packed
from dietgpu_fork_tpu.ops.table import (
    normalize_probs_batched, pack_encode_table)
from dietgpu_fork_tpu.ops.rans_encode import encode_blocks

NTOT = 1 << 24
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


def run(B):
    n = NTOT // B
    rng = np.random.default_rng(0)
    w = (rng.normal(0, 1, (B, n)).astype(np.float32).view(np.uint32) >> 16
         ).astype(np.uint16)
    data32 = jnp.asarray(np.ascontiguousarray(w).view(np.uint32))
    sizes = jnp.full((B,), n, jnp.int32)
    print(f"== B={B} x {n} bf16 ==", flush=True)

    def report(name, dt, nbytes):
        print(f"  {name:14s}: {dt*1e3:8.3f} ms  {nbytes/dt/1e9:7.2f} GB/s",
              flush=True)

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
    report("split+hist", chain_time(build_split), 2 * NTOT)

    def build_table(k):
        @jax.jit
        def f(h):
            out = None
            for i in range(k):
                out = normalize_probs_batched(h, sizes, 10)
                h = h.at[:, :1].set(h[:, :1] ^ out[0][:, :1].astype(U32) ^ U32(i))
            return out
        return lambda: f(hist)
    report("table", chain_time(build_table), NTOT)

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
    report("encode_blocks", chain_time(build_encblk), NTOT)

    def build_enc_core(k):
        @jax.jit
        def f(p):
            out = None
            for i in range(k):
                out = ans_encode_core(p, sizes, 10, hist=hist)
                p = p.at[:, :1].set(p[:, :1] ^ out[0][:, :1] ^ U32(i))
            return out
        return lambda: f(plane)
    report("ans_enc_core", chain_time(build_enc_core), NTOT)

    def build_comp(k):
        @jax.jit
        def f(d):
            out = None
            for i in range(k):
                out = float_compress_core(d, sizes, FloatType.BFLOAT16, 10)
                d = d.at[:, :1].set(d[:, :1] ^ out[0][:, :1] ^ U32(i))
            return out
        return lambda: f(data32)
    report("compress", chain_time(build_comp), 2 * NTOT)

    comp32, cb = jax.jit(lambda d: float_compress_core(
        d, sizes, FloatType.BFLOAT16, 10))(data32)
    comp32 = jnp.asarray(np.asarray(comp32))

    def build_dec(k):
        @jax.jit
        def f(c):
            out = None
            for i in range(k):
                out = float_decompress_core(
                    c, jnp.zeros((B,), I32), n, FloatType.BFLOAT16, 10)
                c = c.at[:, -1:].set(out[0][:, :1] + U32(i))
            return out
        return lambda: f(comp32)
    report("decompress", chain_time(build_dec), 2 * NTOT)


if __name__ == "__main__":
    import sys
    for B in [int(a) for a in (sys.argv[1:] or ["1", "128"])]:
        run(B)
