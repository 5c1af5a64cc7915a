"""Encoder ablation: phase A/B split + cost of each phase-A component."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dietgpu_fork_tpu.core.constants import (
    ANS_START_STATE, ANS_STATE_BITS, STEPS_PER_BLOCK, WARP_SIZE)
from dietgpu_fork_tpu.ops.bitops import bitcast_u8_to_u32
from dietgpu_fork_tpu.ops.histogram import histogram_packed
from dietgpu_fork_tpu.ops.table import (
    normalize_probs_batched, pack_encode_table)
import dietgpu_fork_tpu.ops.pallas.rans_encode_fused as ref

I32 = jnp.int32
U32 = jnp.uint32
N = 1 << 24
_UNROLL = 16
_NJ = 8


def make_phaseA(G4, pb, variant):
    WB_builder = ref._ballot_weights

    def kern(sym_ref, val_ref, tab_ref, mag_ref, out_w_ref, out_m_ref,
             out_st_ref, out_nw_ref, states_s, nw_s):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            states_s[...] = jnp.full((G4, 128), ANS_START_STATE, U32)
            nw_s[...] = jnp.zeros((G4, 128), I32)

        tab = tab_ref[...]
        mag = mag_ref[...]
        valid_n = val_ref[...]
        states = states_s[...]
        nw = nw_s[...]
        lane, gl = ref._grp_iota((G4, 128))
        scs = ANS_STATE_BITS - pb
        WB = WB_builder()
        byte_sh = ((lane & 3) * 8).astype(U32)
        q32 = lane - (lane & 31)
        w3 = (lane & 31) >> 2
        tab_bc = [jnp.broadcast_to(tab[c][None, :], (G4, 128))
                  for c in range(2)]
        mag_bc = [jnp.broadcast_to(mag[c][None, :], (G4, 128))
                  for c in range(2)]

        words_out = []
        masks_out = []
        for u in range(_UNROLL):
            i = j * _UNROLL + u
            if variant == "noinput":
                sym = (states ^ U32(i)) & U32(0xFF)
            else:
                src = pltpu.bitcast(sym_ref[u >> 2], I32)
                w = jnp.take_along_axis(src, q32 + (u & 3) * 8 + w3, axis=1)
                sym = (w.astype(U32) >> byte_sh) & U32(0xFF)
            v = (i * WARP_SIZE + gl) < valid_n

            if variant == "nolut":
                pdf = (sym >> U32(2)) + U32(1)
                cdf = sym
                shift = U32(5)
                mg = sym * U32(77) + U32(3)
            else:
                t_lane = (sym & U32(127)).astype(I32)
                hs = sym > U32(127)
                ent = jnp.take_along_axis(tab_bc[0], t_lane, axis=1)
                mg = jnp.take_along_axis(mag_bc[0], t_lane, axis=1)
                ent = jnp.where(
                    hs, jnp.take_along_axis(tab_bc[1], t_lane, axis=1), ent)
                mg = jnp.where(
                    hs, jnp.take_along_axis(mag_bc[1], t_lane, axis=1), mg)
                pdf = ent & U32(0x7FF)
                cdf = (ent >> U32(11)) & U32(0xFFF)
                shift = ent >> U32(23)
                shift = jnp.where(shift > U32(31), U32(31), shift)

            write = v & (states >= (pdf << U32(scs)))
            word = states & U32(0xFFFF)
            states = jnp.where(write, states >> U32(16), states)

            if variant == "nomul":
                q = states >> shift
            else:
                q = (ref._umulhi_via_16(
                    states, mg >> U32(16), mg & U32(0xFFFF)) + states
                ) >> shift
            mod = states - q * pdf
            states = jnp.where(v, q * U32(1 << pb) + mod + cdf, states)

            words_out.append(jnp.where(write, word, U32(0)))
            if variant == "noballot":
                bits = write.astype(U32)
            else:
                bo = jax.lax.dot_general(
                    write.astype(I32).astype(jnp.float32), WB,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                boi = bo.astype(I32)
                bits = boi[:, :128].astype(U32) | (
                    boi[:, 128:].astype(U32) << U32(16))
            masks_out.append(bits)
            nw = nw + write.astype(I32)

        states_s[...] = states
        nw_s[...] = nw
        if variant == "nopack":
            acc = jnp.zeros((G4, 128), U32)
            for wo in words_out:
                acc = acc ^ wo
            for q in range(4):
                out_w_ref[:, q, :] = acc[:, :128]
            out_m_ref[...] = jnp.concatenate(
                [m[:, :4] for m in masks_out], axis=1)
        else:
            pk_idx = ((lane >> 4) * 32 + 2 * (lane & 15)) & 127
            packed_out = []
            for wo in words_out:
                e = jnp.take_along_axis(wo, pk_idx, axis=1)
                o = jnp.take_along_axis(wo, pk_idx + 1, axis=1)
                packed_out.append(e | (o << U32(16)))
            for q in range(4):
                out_w_ref[:, q, :] = jnp.concatenate(
                    [pw[:, q * 16:(q + 1) * 16] for pw in packed_out], axis=1)
            lane128 = jax.lax.broadcasted_iota(I32, (G4, 128), 1)
            g_idx = (lane128 * 32) & 127
            m4 = [jnp.take_along_axis(m, g_idx, axis=1)[:, :4]
                  for m in masks_out]
            out_m_ref[...] = jnp.concatenate(m4, axis=1)

        @pl.when(j == _NJ - 1)
        def _():
            out_st_ref[...] = states_s[...]
            cnt = ref._grp_broadcast_last(ref._seg_prefix_incl(nw_s[...]))
            lane128 = jax.lax.broadcasted_iota(I32, (G4, 128), 1)
            g_idx = (lane128 * 32) & 127
            out_nw_ref[...] = jnp.take_along_axis(cnt, g_idx, axis=1)[:, :4]

    return kern


def main():
    rng = np.random.default_rng(0)
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16
         ).astype(np.uint16)
    exp = ((w >> 7) & 0xFF).astype(np.uint8)
    x32 = bitcast_u8_to_u32(jnp.asarray(exp.reshape(1, -1)))
    sizes = jnp.array([N], I32)
    hist = jax.jit(histogram_packed)(x32, sizes)
    pdf, cdf, magic, shift = jax.jit(
        lambda h, s: normalize_probs_batched(h, s, 10))(hist, sizes)
    packed = jnp.asarray(np.asarray(pack_encode_table(pdf, cdf, shift)))
    magic = jnp.asarray(np.asarray(magic))

    B = 1
    WPB = 1024
    NB = N // 4096
    G = 256
    G4 = G // 4
    CELLS = NB // G
    xp = x32
    sym = jnp.asarray(np.asarray(
        (xp.reshape(B * CELLS, G4, 4, 32, 4, 8)
         .transpose(0, 3, 1, 2, 4, 5)
         .reshape(B * CELLS, 32, G4, 128))))
    vn = jnp.full((B * CELLS, G4, 128), 4096, I32)
    tab2 = packed.reshape(B, 2, 128)
    mag2 = magic.reshape(B, 2, 128)
    cells = CELLS

    def build(variant, k):
        kern = make_phaseA(G4, 10, variant)

        def call(sy, vn_, t2, m2):
            return pl.pallas_call(
                kern,
                grid=(B, CELLS, _NJ),
                in_specs=[
                    pl.BlockSpec((None, 4, G4, 128),
                                 lambda b, t, j: (b * cells + t, j, 0, 0)),
                    pl.BlockSpec((None, G4, 128),
                                 lambda b, t, j: (b * cells + t, 0, 0)),
                    pl.BlockSpec((None, 2, 128), lambda b, t, j: (b, 0, 0)),
                    pl.BlockSpec((None, 2, 128), lambda b, t, j: (b, 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (None, G4, 4, _UNROLL * 16),
                        lambda b, t, j: (b * cells + t, 0, 0, j)),
                    pl.BlockSpec(
                        (None, None, G4, _UNROLL * 4),
                        lambda b, t, j: (b * cells + t, j, 0, 0)),
                    pl.BlockSpec((None, G4, 128),
                                 lambda b, t, j: (b * cells + t, 0, 0)),
                    pl.BlockSpec((None, G4, 4),
                                 lambda b, t, j: (b * cells + t, 0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct(
                        (B * CELLS, G4, 4, _NJ * _UNROLL * 16), U32),
                    jax.ShapeDtypeStruct(
                        (B * CELLS, _NJ, G4, _UNROLL * 4), U32),
                    jax.ShapeDtypeStruct((B * CELLS, G4, 128), U32),
                    jax.ShapeDtypeStruct((B * CELLS, G4, 4), I32),
                ],
                scratch_shapes=[pltpu.VMEM((G4, 128), U32),
                                pltpu.VMEM((G4, 128), I32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",) * 3),
            )(sy, vn_, t2, m2)

        @jax.jit
        def f(sy):
            out = None
            for i in range(k):
                out = call(sy, vn, tab2, mag2)
                sy = sy.at[0, 0, 0, :1].set(out[0][0, 0, 0, :1] + U32(i))
            return out
        return lambda: f(sym)

    def fence(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    for variant in ["full", "nolut", "nomul", "noballot", "nopack",
                    "noinput"]:
        try:
            f1, fk = build(variant, 1), build(variant, 6)
            fence(f1()); fence(fk())
            t1s, tks = [], []
            for _ in range(3):
                t0 = time.time(); fence(f1()); t1s.append(time.time()-t0)
                t0 = time.time(); fence(fk()); tks.append(time.time()-t0)
            dt = (min(tks) - min(t1s)) / 5
            print(f"phaseA {variant:9s}: {dt*1e3:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{variant} FAILED: {repr(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
