"""Bisect the non-kernel glue in ans_encode_core / ans_decode_core."""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import BLOCK_SIZE
from dietgpu_fork_tpu.models import ans as A
from dietgpu_fork_tpu.models.ans import (
    _ans_parse_and_stage, ans_encode_core, _assemble_archives, _layout,
    _num_blocks_dyn, ans_decode_core)
from dietgpu_fork_tpu.ops.histogram import histogram_packed
from dietgpu_fork_tpu.ops.table import (
    normalize_probs_batched, pack_encode_table, build_decode_tables_split)
from dietgpu_fork_tpu.ops.rans_encode import encode_blocks, MAX_BLOCK_WORDS32
from dietgpu_fork_tpu.ops.bitops import bitcast_u8_to_u32

N = 1 << 24
ITERS = 5
I32 = jnp.int32
U32 = jnp.uint32


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chain_time(build):
    f1, fk = build(1), build(ITERS)
    fence(f1()); fence(fk())
    t1s, tks = [], []
    for _ in range(3):
        t0 = time.time(); fence(f1()); t1s.append(time.time() - t0)
        t0 = time.time(); fence(fk()); tks.append(time.time() - t0)
    return max((min(tks) - min(t1s)) / (ITERS - 1), 1e-9)


def main():
    rng = np.random.default_rng(0)
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16
         ).astype(np.uint16)
    exp = ((w >> 7) & 0xFF).astype(np.uint8)
    plane = bitcast_u8_to_u32(jnp.asarray(exp.reshape(1, -1)))
    plane = jnp.asarray(np.asarray(plane))
    sizes = jnp.array([N], I32)
    hist = jnp.asarray(np.asarray(jax.jit(histogram_packed)(plane, sizes)))

    # ENCODE bisection ------------------------------------------------
    def enc_until(stage, p):
        pdf, cdf, magic, shift = normalize_probs_batched(hist, sizes, 10)
        if stage == "table":
            return pdf
        packed = pack_encode_table(pdf, cdf, shift)
        states, streams32, num_words = encode_blocks(
            p, sizes, packed, magic, 10)
        if stage == "blocks":
            return streams32
        aligned = ((num_words + 7) // 8) * 8
        incl = jnp.cumsum(aligned, axis=1)
        prefix = incl - aligned
        total_words = incl[:, -1].astype(U32)
        if stage == "prefix":
            return streams32, prefix
        nb = _num_blocks_dyn(sizes)
        NB = streams32.shape[1]
        blk = jnp.arange(NB, dtype=I32)[None, :]
        uncomp_w = jnp.clip(
            sizes[:, None] - blk * BLOCK_SIZE, 0, BLOCK_SIZE).astype(U32)
        hdr8 = jnp.zeros((1, 8), U32)
        out32 = _assemble_archives(
            hdr8, pdf, states, uncomp_w, num_words, prefix, streams32, nb,
            total_words.astype(I32), 1 << 21)
        return out32

    for stage in ("table", "blocks", "prefix", "assemble"):
        def build(k, stage=stage):
            @jax.jit
            def f(p):
                out = None
                for i in range(k):
                    out = enc_until(stage, p)
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    upd = leaf.reshape(-1)[:1].astype(U32) + U32(i)
                    p = p.at[:, :1].set(p[:, :1] ^ upd)
                return out
            return lambda: f(plane)
        print(f"enc->{stage:9s}: {chain_time(build)*1e3:8.3f} ms",
              flush=True)

    # full core for reference
    def build(k):
        @jax.jit
        def f(p):
            out = None
            for i in range(k):
                out = ans_encode_core(p, sizes, 10, hist=hist)
                p = p.at[:, :1].set(p[:, :1] ^ out[0][:, :1] ^ U32(i))
            return out
        return lambda: f(plane)
    print(f"enc core      : {chain_time(build)*1e3:8.3f} ms", flush=True)

    arch32, cb = jax.jit(
        lambda p: ans_encode_core(p, sizes, 10, hist=hist))(plane)
    arch32 = jnp.asarray(np.asarray(arch32))

    # DECODE bisection ------------------------------------------------
    def dec_until(stage, c):
        res = _ans_parse_and_stage(c, jnp.zeros((1,), I32), N, None)
        streams, comp_w, uncomp_w, states, pdf, success, n, csum, NB = res
        if stage == "parse":
            return streams
        sym4, symtab = build_decode_tables_split(pdf, 10)
        if stage == "tables":
            return streams, sym4
        from dietgpu_fork_tpu.ops.pallas.rans_decode_fused2 import (
            decode_blocks_fused2)
        out_blocks = decode_blocks_fused2(
            streams, comp_w, uncomp_w, states, sym4, symtab, 10)
        return out_blocks

    for stage in ("parse", "tables", "kernel"):
        def build(k, stage=stage):
            @jax.jit
            def f(c):
                out = None
                for i in range(k):
                    out = dec_until(stage, c)
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    upd = leaf.reshape(-1)[:1].astype(U32) + U32(i)
                    c = c.at[:, -1:].set(upd[None])
                return out
            return lambda: f(arch32)
        print(f"dec->{stage:9s}: {chain_time(build)*1e3:8.3f} ms",
              flush=True)

    def build(k):
        @jax.jit
        def f(c):
            out = None
            for i in range(k):
                out = ans_decode_core(c, jnp.zeros((1,), I32), N, 10)
                c = c.at[:, -1:].set(out[0][:, :1] + U32(i))
            return out
        return lambda: f(arch32)
    print(f"dec core      : {chain_time(build)*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
