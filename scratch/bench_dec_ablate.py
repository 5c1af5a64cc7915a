"""Ablation timing for the v2 decode kernel: which parts cost what.

Variants (correctness NOT preserved except 'full'):
  full        - the real kernel
  read0       - renorm read loop removed (state fed from suffix only)
  read2       - fixed 2-chunk read (no fori)
  suffroll    - roll-based suffix/tot instead of MXU dot
  nolut       - table lookups replaced by arithmetic on sbar
  nopack      - per-step pack removed (emit raw sym word sum at end)
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dietgpu_fork_tpu.core.constants import ANS_MIN_STATE, STEPS_PER_BLOCK

I32 = jnp.int32
U32 = jnp.uint32
F32 = jnp.float32
_UNROLL = 16
_NJ = 8
_REB = 8


def _suffix_weights():
    r = jax.lax.broadcasted_iota(I32, (128, 256), 0)
    c = jax.lax.broadcasted_iota(I32, (128, 256), 1)
    cl = c & 127
    same = (r >> 5) == (cl >> 5)
    take = same & ((c >= 128) | (r >= cl))
    return jnp.where(take, 1.0, 0.0).astype(F32)


def make_kernel(G4, SW, SLC, pb, variant):
    def kern(st_ref, cw_ref, uw_ref, sym4_ref, stab_ref, stream_ref,
             out_ref, states_s, ptr_s):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            states_s[...] = st_ref[...]
            ptr_s[...] = cw_ref[...]

        uw = uw_ref[...]
        cw = cw_ref[...]
        states = states_s[...]
        ptr = ptr_s[...]
        lane = jax.lax.broadcasted_iota(I32, (G4, 128), 1)
        gl = lane & 31
        q32 = lane - gl
        r = ((uw - 1) % 32) + 1
        nsteps = -(-uw // 32)
        mask = U32((1 << pb) - 1)
        ofs32 = SW - ((cw + 1) >> 1)
        live = uw > 0
        W = _suffix_weights()
        sym4_bc = [jnp.broadcast_to(sym4_ref[c][None, :], (G4, 128))
                   for c in range(SLC)]
        stab_bc = [jnp.broadcast_to(stab_ref[c][None, :], (G4, 128))
                   for c in range(2)]

        def one_step(i, du, states, ptr, hi_c, mn):
            k = i - (STEPS_PER_BLOCK - nsteps)
            active = (k >= 0) & live
            lane_valid = active & ((k > 0) | (gl < r))
            sbar = states & mask
            if variant == "nolut":
                sym = sbar & U32(0xFF)
                pdfv = (sbar >> U32(2)) + U32(1)
                cdfv = sbar >> U32(1)
            else:
                sidx = (sbar >> U32(2)).astype(I32)
                slane = sidx & 127
                schunk = sidx >> 7
                w = jnp.take_along_axis(sym4_bc[0], slane, axis=1)
                for c in range(1, SLC):
                    g = jnp.take_along_axis(sym4_bc[c], slane, axis=1)
                    w = jnp.where(schunk == c, g, w)
                sym = (w >> ((sbar & U32(3)) << U32(3))) & U32(0xFF)
                tl = (sym & U32(127)).astype(I32)
                e = jnp.take_along_axis(stab_bc[0], tl, axis=1)
                e = jnp.where(
                    sym > U32(127),
                    jnp.take_along_axis(stab_bc[1], tl, axis=1), e)
                pdfv = e & U32(0xFFFF)
                cdfv = e >> U32(16)
            states = jnp.where(
                lane_valid, pdfv * (states >> U32(pb)) + sbar - cdfv, states)

            read = lane_valid & (states < U32(ANS_MIN_STATE))
            if variant == "suffroll":
                x = read.astype(I32)
                n = 128
                for kk in (1, 2, 4, 8, 16):
                    sh = pltpu.roll(x, n - kk, 1)
                    x = x + jnp.where(gl < 32 - kk, sh, 0)
                suffix = x
                tot = jnp.take_along_axis(suffix, q32, axis=1)
            else:
                so = jax.lax.dot_general(
                    read.astype(I32).astype(F32), W,
                    (((1,), (0,)), ((), ())), preferred_element_type=F32)
                suffix = so[:, :128].astype(I32)
                tot = so[:, 128:].astype(I32)
            idx16 = ptr - suffix
            gidx = jnp.clip(ofs32 + (idx16 >> 1), 0, SW - 1)
            lane_t = q32 | (gidx & 31)
            c2 = gidx >> 5
            if variant == "read0":
                w32 = suffix.astype(U32)
            elif variant == "read2":
                lo_c = jnp.maximum((mn - 17 - 16 * du) >> 5, 0)
                g0 = jnp.take_along_axis(stream_ref[lo_c], lane_t, axis=1)
                g1 = jnp.take_along_axis(stream_ref[lo_c + 1], lane_t, axis=1)
                w32 = jnp.where(c2 == lo_c, g0, g1)
            else:
                lo_c = jnp.maximum((mn - 17 - 16 * du) >> 5, 0)

                def rd(c, w32):
                    g = jnp.take_along_axis(stream_ref[c], lane_t, axis=1)
                    return jnp.where(c2 == c, g, w32)

                w32 = jax.lax.fori_loop(
                    lo_c, hi_c + 1, rd, jnp.zeros((G4, 128), U32),
                    unroll=False)
            val = jnp.where((idx16 & 1) == 1, w32 >> U32(16),
                            w32 & U32(0xFFFF))
            states = jnp.where(read, (states << U32(16)) + val, states)
            ptr = ptr - tot
            sym = jnp.where(lane_valid, sym, U32(0))
            return states, ptr, sym

        pack_idx = 32 * (lane >> 3) + 4 * (lane & 7)

        def pack(sym):
            p = sym | (pltpu.roll(sym, 127, 1) << U32(8))
            word = jnp.take_along_axis(p, pack_idx, axis=1) | (
                jnp.take_along_axis(p, pack_idx + 2, axis=1) << U32(16))
            return word[:, :32]

        words = []
        acc = jnp.zeros((G4, 128), U32)
        for half in range(2):
            ptrg = ofs32 + (ptr >> 1)
            hi_c = jnp.max(jnp.where(live, ptrg, 0)) >> 5
            mn = jnp.min(jnp.where(live, ptrg, 2 * SW))
            for du in range(_REB):
                u = half * _REB + du
                states, ptr, sym = one_step(
                    j * _UNROLL + u, du, states, ptr, hi_c, mn)
                if variant == "nopack":
                    acc = acc ^ sym
                else:
                    words.append(pack(sym))
        states_s[...] = states
        ptr_s[...] = ptr
        if variant == "nopack":
            for q in range(4):
                out_ref[:, q, :] = acc
        else:
            for q in range(4):
                out_ref[:, q, :] = jnp.concatenate(
                    [w[:, q * 8:(q + 1) * 8] for w in words[::-1]], axis=1)

    return kern


def main():
    import dietgpu_fork_tpu.ops.pallas.rans_decode_fused2 as rdf2
    rng = np.random.default_rng(7)
    # build a real staged workload from an actual archive
    from dietgpu_fork_tpu.ops.bitops import bitcast_u8_to_u32
    from dietgpu_fork_tpu.ops.histogram import histogram_packed
    from dietgpu_fork_tpu.ops.table import (
        normalize_probs_batched, pack_encode_table, build_decode_tables_split)
    from dietgpu_fork_tpu.ops.rans_encode import (
        encode_blocks, MAX_BLOCK_WORDS32)
    N = 1 << 24
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16
         ).astype(np.uint16)
    exp = ((w >> 7) & 0xFF).astype(np.uint8)
    x32 = bitcast_u8_to_u32(jnp.asarray(exp.reshape(1, -1)))
    sizes = jnp.array([N], I32)
    hist = jax.jit(histogram_packed)(x32, sizes)
    pdf, cdf, magic, shift = jax.jit(
        lambda h, s: normalize_probs_batched(h, s, 10))(hist, sizes)
    packed = pack_encode_table(pdf, cdf, shift)
    states, streams32, num_words = jax.jit(
        lambda x, s: encode_blocks(x, s, packed, magic, 10))(x32, sizes)
    NB = states.shape[1]
    SW = 1312
    cw = np.asarray(num_words).astype(np.int32)
    ea = np.zeros((1, NB, SW), np.uint32)
    st_src = np.asarray(streams32)
    for k in range(NB):
        n32 = (int(cw[0, k]) + 1) >> 1
        ea[0, k, SW - n32:] = st_src[0, k, :n32]
    sym4, symtab = jax.jit(
        lambda p: build_decode_tables_split(p, 10))(pdf)

    G = 256
    G4 = G // 4
    ST, cwr, uwr, st, NBP, CELLS, C2 = rdf2._stage(
        jnp.asarray(ea), jnp.asarray(cw),
        jnp.asarray(np.full((1, NB), 4096, np.int32)),
        jnp.asarray(np.asarray(states)), G)
    sym4_r = jnp.asarray(np.asarray(sym4)).reshape(1, 2, 128)
    stab_r = jnp.asarray(np.asarray(symtab)).reshape(1, 2, 128)
    args = (st, cwr, uwr, sym4_r, stab_r, ST)
    args = tuple(jnp.asarray(np.asarray(a)) for a in args)

    def build(variant, k_iter):
        kern = make_kernel(G4, SW, 2, 10, variant)
        cells = CELLS

        def call(st_, cwr_, uwr_, s4, stb, ST_):
            return pl.pallas_call(
                kern,
                grid=(1, CELLS, _NJ),
                in_specs=[
                    pl.BlockSpec((None, G4, 128),
                                 lambda b, t, j: (b * cells + t, 0, 0)),
                    pl.BlockSpec((None, G4, 128),
                                 lambda b, t, j: (b * cells + t, 0, 0)),
                    pl.BlockSpec((None, G4, 128),
                                 lambda b, t, j: (b * cells + t, 0, 0)),
                    pl.BlockSpec((None, 2, 128), lambda b, t, j: (b, 0, 0)),
                    pl.BlockSpec((None, 2, 128), lambda b, t, j: (b, 0, 0)),
                    pl.BlockSpec((None, C2, G4, 128),
                                 lambda b, t, j: (b * cells + t, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (None, G4, 4, 128),
                    lambda b, t, j: (b * cells + t, 0, 0, _NJ - 1 - j)),
                out_shape=jax.ShapeDtypeStruct((CELLS, G4, 4, _NJ * 128),
                                               U32),
                scratch_shapes=[pltpu.VMEM((G4, 128), U32),
                                pltpu.VMEM((G4, 128), I32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",) * 3),
            )(st_, cwr_, uwr_, s4, stb, ST_)

        @jax.jit
        def f(st_, cwr_, uwr_, s4, stb, ST_):
            out = None
            for i in range(k_iter):
                out = call(st_, cwr_, uwr_, s4, stb, ST_)
                ST_ = ST_.at[0, 0, 0, :1].set(out[0, 0, 0, :1] + U32(i))
            return out
        return f

    def fence(x):
        return np.asarray(x.ravel()[:1])

    for variant in ["full", "read2", "read0", "suffroll", "nolut",
                    "nopack"]:
        try:
            f1 = build(variant, 1)
            fk = build(variant, 6)
            fence(f1(*args)); fence(fk(*args))
            t1s, tks = [], []
            for _ in range(4):
                t0 = time.time(); fence(f1(*args)); t1s.append(time.time()-t0)
                t0 = time.time(); fence(fk(*args)); tks.append(time.time()-t0)
            dt = (min(tks) - min(t1s)) / 5
            print(f"{variant:9s}: {dt*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{variant} FAILED: {repr(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
