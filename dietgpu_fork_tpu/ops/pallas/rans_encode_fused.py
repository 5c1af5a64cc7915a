"""Fused Pallas rANS encoder: two kernels, both full-lane-width.

Phase A (main walk) processes 4 blocks per 128-lane row — the encoder has
no per-block gathers in its hot loop (tables are shared per batch member),
so nothing forces the quarter-lane layout the decoder needs. Per step it
updates the 32 interleaved states of each block (magic-multiply division
exactly as GpuANSEncode.cuh:50-90, rebuilt from 16-bit partial products
because the VPU has no umulhi), and stores the step's potential emissions
DENSELY: one u16 word + one mask bit per (block, step, lane). The walk is
the third grid dimension (32 invocations x 4 steps) with states persisted
in VMEM scratch — same scheme as the fused decoder.

Phase B (compaction) turns the dense (step, lane) emission matrix into the
format's stream order (step-major, lane-ascending within each block,
GpuANSEncode.cuh:63-89) with pure gathers: for stream u16 index w, binary
search the per-step count cumsum for its step, then rank-select the lane
bit in that step's 32-bit emission mask. No scatter, no sort — the
reference's warp ballot+prefix becomes popcount arithmetic.

Emission-density bound: a lane emits at most one u16 per step, and a
renormalization at probability p happens at most every other step for
p >= 1/4; the format's worst case is 2560 u16 words per 4096-byte block
(getRawCompBlockMaxSize, GpuANSEncode.cuh:31-36).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import pallas_call

from ...core.constants import (
    ANS_START_STATE,
    ANS_STATE_BITS,
    BLOCK_SIZE,
    STEPS_PER_BLOCK,
    WARP_SIZE,
)

I32 = jnp.int32
U32 = jnp.uint32

_UNROLL = 16  # steps per phase-A grid invocation
_NJ = STEPS_PER_BLOCK // _UNROLL  # 8

# stream output geometry: 1280 u32 words (2560 u16) per block, 10 chunks
_SOW = 1280
_NCH = _SOW // 128


def _grp_iota(shape):
    lane = jax.lax.broadcasted_iota(I32, shape, len(shape) - 1)
    return lane, lane % WARP_SIZE


def _seg_prefix_incl(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum within each aligned 32-lane group."""
    _, gl = _grp_iota(x.shape)
    n = x.shape[-1]
    for k in (1, 2, 4, 8, 16):
        shifted = pltpu.roll(x, k, x.ndim - 1)
        x = x + jnp.where(gl >= k, shifted, 0)
    return x


def _grp_broadcast_last(x: jax.Array) -> jax.Array:
    """Broadcast the value at the LAST lane of each 32-group to the group."""
    _, gl = _grp_iota(x.shape)
    out = jnp.where(gl == WARP_SIZE - 1, x, 0)
    for k in (1, 2, 4, 8, 16):
        shifted = pltpu.roll(out, WARP_SIZE * 4 - k, x.ndim - 1)
        out = out | jnp.where(gl < WARP_SIZE - k, shifted, 0)
    return out


def _umulhi_via_16(a: jax.Array, mh: jax.Array, ml: jax.Array) -> jax.Array:
    """High 32 bits of a * (mh<<16 | ml), all uint32 lanes."""
    ah = a >> U32(16)
    al = a & U32(0xFFFF)
    t = al * ml
    mid1 = ah * ml
    mid2 = al * mh
    carry = (
        (t >> U32(16)) + (mid1 & U32(0xFFFF)) + (mid2 & U32(0xFFFF))
    ) >> U32(16)
    return ah * mh + (mid1 >> U32(16)) + (mid2 >> U32(16)) + carry


def _ballot_weights():
    """(128, 256) f32: col l<128 sums 2^(m&31) over same-group lanes with
    (m&31)<16; col l>=128 the same for the high half (minus 16). The matmul
    of a 0/1 write mask against this yields each 32-lane group's emission
    ballot in two exact 16-bit halves (the reference's __ballot_sync,
    GpuANSEncode.cuh:68-73)."""
    r = jax.lax.broadcasted_iota(I32, (128, 256), 0)
    c = jax.lax.broadcasted_iota(I32, (128, 256), 1)
    cl = c & 127
    same = (r >> 5) == (cl >> 5)
    rb = r & 31
    lo = same & (c < 128) & (rb < 16)
    hi = same & (c >= 128) & (rb >= 16)
    w = jnp.where(lo | hi, 1.0, 0.0).astype(jnp.float32)
    scale = (jnp.int32(1) << jnp.where(rb < 16, rb, rb - 16)).astype(
        jnp.float32
    )
    return w * scale[:, :1]


def _encode_kernel(
    sym_ref, val_ref, tab_ref, mag_ref, out_w_ref, out_m_ref,
    out_st_ref, out_nw_ref, states_s, nw_s, *, prob_bits: int, G4: int,
    native: bool = False,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        states_s[...] = jnp.full((G4, 128), ANS_START_STATE, U32)
        nw_s[...] = jnp.zeros((G4, 128), I32)

    valid_n = val_ref[...]  # (G4, 128) int32: block byte count
    states = states_s[...]
    nw = nw_s[...]

    lane, gl = _grp_iota((G4, 128))
    state_check_shift = ANS_STATE_BITS - prob_bits
    prob_mul = U32(1 << prob_bits)
    WB = _ballot_weights()

    # natural symbol input: sym_ref[g4, q, :] holds words j*128..j*128+127
    # of block (g4, q). Each 4-step slab (lane q*32 + ds*8 + w3 = word
    # s*32 + ds*8 + w3 of block q) is built IN-VMEM from 4 static-index
    # gathers + selects — the driver-side XLA transpose this replaces cost
    # ~0.6 ms per 16 MiB plane (measured, scratch/time_enc_parts.py), ~6x
    # the in-kernel rebuild.
    byte_sh = ((lane & 3) * 8).astype(U32)
    q32 = lane - (lane & 31)
    w3 = (lane & 31) >> 2
    lane31 = lane & 31
    qsel = lane >> 5
    # sym_ref is the whole cell (G4, 4, _NJ, 128); its block index is
    # j-invariant so Pallas DMAs it once per cell. Dynamic-j sublane load:
    xq = [
        pltpu.bitcast(
            sym_ref[:, q, pl.dslice(j, 1), :].reshape(
                sym_ref.shape[0], 128
            ),
            I32,
        )
        for q in range(4)
    ]
    # PER-ROW tables (each G4 row's 4 blocks share one member, so the
    # symbol->entry gather is an ordinary per-row take_along_axis; this is
    # what lets one cell span many batch members — the bs=128 regime)
    tab_bc = [tab_ref[c] for c in range(2)]
    mag_bc = [mag_ref[c] for c in range(2)]

    words_out = []
    masks_out = []
    slab = None
    for u in range(_UNROLL):
        i = j * _UNROLL + u
        if u & 3 == 0:
            idx = (u >> 2) * 32 + lane31
            slab = jnp.take_along_axis(xq[0], idx, axis=1)
            for q in range(1, 4):
                g = jnp.take_along_axis(xq[q], idx, axis=1)
                slab = jnp.where(qsel == q, g, slab)
        w = jnp.take_along_axis(slab, q32 + (u & 3) * 8 + w3, axis=1)
        sym = (w.astype(U32) >> byte_sh) & U32(0xFF)
        v = (i * WARP_SIZE + gl) < valid_n

        t_lane = (sym & U32(127)).astype(I32)
        hi_sym = sym > U32(127)
        ent = jnp.take_along_axis(tab_bc[0], t_lane, axis=1)
        mg = jnp.take_along_axis(mag_bc[0], t_lane, axis=1)
        ent = jnp.where(
            hi_sym, jnp.take_along_axis(tab_bc[1], t_lane, axis=1), ent
        )
        mg = jnp.where(
            hi_sym, jnp.take_along_axis(mag_bc[1], t_lane, axis=1), mg
        )

        # unpack_encode_table layout: pdf | cdf<<12 | shift<<23; shift is
        # 0..11 by construction (pdf==0 rows pack shift 0 and are never
        # taken by valid lanes) — the clamp is purely defensive
        pdf = ent & U32(0xFFF)
        cdf = (ent >> U32(12)) & U32(0x7FF)
        shift = ent >> U32(23)
        shift = jnp.where(shift > U32(31), U32(31), shift)

        write = v & (states >= (pdf << U32(state_check_shift)))
        word = states & U32(0xFFFF)
        states = jnp.where(write, states >> U32(16), states)

        q = (
            _umulhi_via_16(states, mg >> U32(16), mg & U32(0xFFFF)) + states
        ) >> shift
        mod = states - q * pdf
        states = jnp.where(v, q * prob_mul + mod + cdf, states)

        words_out.append(jnp.where(write, word, U32(0)))
        # 32-bit emission ballot per block via one MXU matmul
        bo = jax.lax.dot_general(
            write.astype(I32).astype(jnp.float32), WB,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        boi = bo.astype(I32)
        bits = boi[:, :128].astype(U32) | (
            boi[:, 128:].astype(U32) << U32(16)
        )
        masks_out.append(bits)
        nw = nw + write.astype(I32)

    states_s[...] = states
    nw_s[...] = nw

    if native:
        # ROW-STREAM staging: emission order is (step, block, lane) across
        # the full 128-lane row, so flat u16 index f = step*128 + lane.
        # Pack lane pairs (2k, 2k+1) into u32s (lanes 0..63) and stack TWO
        # steps per 128-lane chunk row: staged u32 (f >> 1) sits at chunk
        # f >> 8, lane (f >> 1) & 127 — the same fetch formula phase B
        # already uses for the per-block layout.
        pk2 = (2 * lane) & 127
        hi_half = lane >= 64
        packed_n = []
        for wo in words_out:
            e = jnp.take_along_axis(wo, pk2, axis=1)
            o = jnp.take_along_axis(wo, (pk2 + 1) & 127, axis=1)
            packed_n.append(e | (o << U32(16)))  # lanes 0..63 valid
        for c in range(_UNROLL // 2):
            odd = pltpu.roll(packed_n[2 * c + 1], 64, 1)
            out_w_ref[c] = jnp.where(hi_half, odd, packed_n[2 * c])
    else:
        # words staged CHUNK-major, packed two u16 per lane: this
        # invocation's 16 steps form two 8-step chunks so phase B can index
        # chunks on a leading ref dim (dynamic lane slicing is not a thing
        # on TPU)
        pk_idx = ((lane >> 4) * 32 + 2 * (lane & 15)) & 127  # >=64 unused
        packed_out = []
        for wo in words_out:
            e = jnp.take_along_axis(wo, pk_idx, axis=1)
            o = jnp.take_along_axis(wo, pk_idx + 1, axis=1)
            packed_out.append(e | (o << U32(16)))
        for half in range(2):
            for q in range(4):
                out_w_ref[half, :, q, :] = jnp.concatenate(
                    [
                        pw[:, q * 16 : (q + 1) * 16]
                        for pw in packed_out[half * 8 : half * 8 + 8]
                    ],
                    axis=1,
                )
    # one mask lane per (block, step): lanes 0..15 = (step u, group g).
    # Mosaic's lane gather needs idx shape == operand shape, so gather
    # full-width with idx lane*32 mod 128 (lanes 0..3 = group starts) and
    # slice the first four lanes.
    lane128 = jax.lax.broadcasted_iota(I32, (G4, 128), 1)
    g_idx = (lane128 * 32) & 127
    m4 = [jnp.take_along_axis(m, g_idx, axis=1)[:, :4] for m in masks_out]
    out_m_ref[...] = jnp.concatenate(m4, axis=1)

    @pl.when(j == _NJ - 1)
    def _():
        out_st_ref[...] = states_s[...]
        # nw_s counts emissions per LANE; per-block count = group sum
        cnt = _grp_broadcast_last(_seg_prefix_incl(nw_s[...]))
        out_nw_ref[...] = jnp.take_along_axis(cnt, g_idx, axis=1)[:, :4]


def _popcount32(x: jax.Array) -> jax.Array:
    """SWAR population count of uint32 lanes."""
    x = x - ((x >> U32(1)) & U32(0x55555555))
    x = (x & U32(0x33333333)) + ((x >> U32(2)) & U32(0x33333333))
    x = (x + (x >> U32(4))) & U32(0x0F0F0F0F)
    return ((x * U32(0x01010101)) >> U32(24)).astype(I32)


def _ctz32(x: jax.Array) -> jax.Array:
    """Count trailing zeros of uint32 lanes (32 for x == 0)."""
    return _popcount32((~x) & (x - U32(1)))


def _rank_select32(m: jax.Array, r: jax.Array) -> jax.Array:
    """Lane index of the r-th (0-based) set bit of each uint32 in m."""
    pos = jnp.zeros(m.shape, I32)
    rem = r
    for w in (16, 8, 4, 2, 1):
        lowmask = U32((1 << w) - 1)
        low = (m >> pos.astype(U32)) & lowmask
        c = _popcount32(low)
        go_hi = rem >= c
        pos = jnp.where(go_hi, pos + w, pos)
        rem = jnp.where(go_hi, rem - c, rem)
    return pos


def _compact_kernel(
    nwmax_ref, words_ref, masks_ref, out_ref, csum_s, nes_s, ws, *, G: int,
):
    """Phase B v2: ONE binary search per u16 PAIR (the odd word's step is
    the even word's step or the next emitting step, a precomputed suffix-
    min), and the staged-value gather scans a small adaptive chunk window
    (chunks on a leading ref dim) instead of all 16 chunks."""
    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    ch = pl.program_id(2)
    lane = jax.lax.broadcasted_iota(I32, (G, 128), 1)

    @pl.when(ch == 0)
    def _():
        counts = _popcount32(masks_ref[...])
        incl = counts
        for k in (1, 2, 4, 8, 16, 32, 64):
            shifted = pltpu.roll(incl, k, 1)
            incl = incl + jnp.where(lane >= k, shifted, 0)
        csum_s[...] = incl - counts  # exclusive cumsum of per-step counts
        # next emitting step (exclusive suffix-min of steps with count>0)
        e = jnp.where(counts > 0, lane, 999)
        x = jnp.where(lane == 127, 999, pltpu.roll(e, 127, 1))
        for k in (1, 2, 4, 8, 16, 32, 64):
            sh = pltpu.roll(x, 128 - k, 1)
            x = jnp.minimum(x, jnp.where(lane < 128 - k, sh, 999))
        nes_s[...] = x

    base = ch * 256  # first u16 index of this chunk (128 u32 words)

    @pl.when(base < nwmax_ref[cell])
    def _():
        csum = csum_s[...]
        nes = nes_s[...]
        masks = masks_ref[...]
        nw = csum[:, 127:128] + _popcount32(masks[:, 127:128])

        w0 = base + lane * 2
        # step of the even u16 = last s with csum[s] <= w0
        lo = jnp.zeros((G, 128), I32)
        for w in (64, 32, 16, 8, 4, 2, 1):
            mid = jnp.minimum(lo + w, 127)
            probe = jnp.take_along_axis(csum, mid, axis=1)
            lo = jnp.where(probe <= w0, mid, lo)
        s0 = lo
        cs0 = jnp.take_along_axis(csum, s0, axis=1)
        m0 = jnp.take_along_axis(masks, s0, axis=1)
        r0 = w0 - cs0
        lb0 = _rank_select32(m0, r0)
        cnt0 = _popcount32(m0)

        # odd u16: same step -> next set bit after lb0 (ctz, ~10 ALU ops
        # vs the 45-op general rank-select); different step -> r1 is
        # always 0 (s1 is the next EMITTING step, so csum[s1] = cs0 +
        # cnt0 = w0 + 1), i.e. the first set bit of m1.
        same = (r0 + 1) < cnt0
        s1 = jnp.where(
            same, s0,
            jnp.minimum(jnp.take_along_axis(nes, s0, axis=1), 127),
        )
        m1 = jnp.where(same, m0, jnp.take_along_axis(masks, s1, axis=1))
        above = m0 >> ((lb0 + 1) & 31).astype(U32)  # lb0=31 => never same
        nxt = lb0 + 1 + _ctz32(above)
        lb1 = jnp.where(same, nxt, _ctz32(m1))

        flat0 = s0 * 32 + lb0
        flat1 = s1 * 32 + lb1
        valid0 = w0 < nw
        valid1 = (w0 + 1) < nw
        fc0 = flat0 >> 8
        fc1 = flat1 >> 8
        c_lo = jnp.minimum(
            jnp.min(jnp.where(valid0, fc0, 15)),
            jnp.min(jnp.where(valid1, fc1, 15)),
        )
        c_hi = jnp.maximum(
            jnp.max(jnp.where(valid0, fc0, 0)),
            jnp.max(jnp.where(valid1, fc1, 0)),
        )

        def fetch(flat, fchunk):
            # a 256-u16 output chunk spans ~12 steps = ~2 source chunks of
            # the step-major staging, so 4 static reads cover almost every
            # call; wider (ragged-cell) windows fall to the fori tail
            fl = (flat >> 1) & 127
            w32 = jnp.zeros((G, 128), U32)
            for t in range(4):
                c = jnp.minimum(c_lo + t, 15)
                g = jnp.take_along_axis(words_ref[c], fl, axis=1)
                w32 = jnp.where(fchunk == c_lo + t, g, w32)
            ws[...] = w32

            @pl.when(c_hi - c_lo >= 4)
            def _():
                def rd(c, _):
                    g = jnp.take_along_axis(words_ref[c], fl, axis=1)
                    ws[...] = jnp.where(fchunk == c, g, ws[...])
                    return 0

                jax.lax.fori_loop(c_lo + 4, c_hi + 1, rd, 0, unroll=False)

            v = ws[...]
            return jnp.where((flat & 1) == 1, v >> U32(16), v & U32(0xFFFF))

        lo16 = jnp.where(valid0, fetch(flat0, fc0), U32(0))
        hi16 = jnp.where(valid1, fetch(flat1, fc1), U32(0))
        out_ref[...] = lo16 | (hi16 << U32(16))

    @pl.when(base >= nwmax_ref[cell])
    def _():
        out_ref[...] = jnp.zeros((G, 128), U32)


_NCHR = 4 * _SOW // 128  # 40 output u32 chunks per row stream


def _compact_kernel_rows(
    nwmax_ref, words_ref, masks_ref, out_ref, csum_s, cq_s, nes_s, ws,
    *, G4: int,
):
    """Phase B for the ROW-STREAM native layout. Output u16 index w of a
    row maps to emission (step s, block q, lane lb): s by binary search of
    the row's per-step emission-count cumsum (counts summed over the row's
    4 blocks), q by ranking against the step's per-block popcount prefix
    (packed c1|c2<<8|c3<<16|c4<<24), lb by a 32-bit rank-select within
    block q's step mask. Only the EVEN u16 of each staged u32 pays the
    search + rank-select; its odd partner is the next emission in row
    order — same block: next set bit (ctz); next block in the same step:
    first set bit of that block's mask; else: first emission of the next
    emitting step (a precomputed suffix-min), where its rank is 0 by
    construction."""
    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    ch = pl.program_id(2)
    lane = jax.lax.broadcasted_iota(I32, (G4, 128), 1)

    m = [masks_ref[q] for q in range(4)]

    @pl.when(ch == 0)
    def _():
        c1 = _popcount32(m[0])
        c2 = c1 + _popcount32(m[1])
        c3 = c2 + _popcount32(m[2])
        counts = c3 + _popcount32(m[3])
        incl = counts
        for k in (1, 2, 4, 8, 16, 32, 64):
            shifted = pltpu.roll(incl, k, 1)
            incl = incl + jnp.where(lane >= k, shifted, 0)
        csum_s[...] = incl - counts  # exclusive cumsum over the 128 steps
        cq_s[...] = (
            c1.astype(U32)
            | (c2.astype(U32) << U32(8))
            | (c3.astype(U32) << U32(16))
            | (counts.astype(U32) << U32(24))
        )
        # next emitting step (exclusive suffix-min of steps with count>0)
        e = jnp.where(counts > 0, lane, 999)
        x = jnp.where(lane == 127, 999, pltpu.roll(e, 127, 1))
        for k in (1, 2, 4, 8, 16, 32, 64):
            sh = pltpu.roll(x, 128 - k, 1)
            x = jnp.minimum(x, jnp.where(lane < 128 - k, sh, 999))
        nes_s[...] = x

    base = ch * 256  # first u16 index of this output chunk (128 u32)

    @pl.when(base < nwmax_ref[cell])
    def _():
        csum = csum_s[...]
        cq = cq_s[...]
        nes = nes_s[...]
        nw = csum[:, 127:128] + (
            _popcount32(m[0][:, 127:128])
            + _popcount32(m[1][:, 127:128])
            + _popcount32(m[2][:, 127:128])
            + _popcount32(m[3][:, 127:128])
        )

        w0 = base + lane * 2
        # even u16: binary search for its step
        lo = jnp.zeros((G4, 128), I32)
        for width in (64, 32, 16, 8, 4, 2, 1):
            mid = jnp.minimum(lo + width, 127)
            probe = jnp.take_along_axis(csum, mid, axis=1)
            lo = jnp.where(probe <= w0, mid, lo)
        s0 = lo
        r0 = w0 - jnp.take_along_axis(csum, s0, axis=1)
        cqs = jnp.take_along_axis(cq, s0, axis=1)
        c1 = (cqs & U32(0xFF)).astype(I32)
        c2 = ((cqs >> U32(8)) & U32(0xFF)).astype(I32)
        c3 = ((cqs >> U32(16)) & U32(0xFF)).astype(I32)
        c4 = (cqs >> U32(24)).astype(I32)
        q0 = (
            (r0 >= c1).astype(I32)
            + (r0 >= c2).astype(I32)
            + (r0 >= c3).astype(I32)
        )
        ms0 = [jnp.take_along_axis(mm, s0, axis=1) for mm in m]
        mq0 = ms0[0]
        for qq in range(1, 4):
            mq0 = jnp.where(q0 == qq, ms0[qq], mq0)
        rsub0 = r0 - jnp.where(
            q0 == 0, 0, jnp.where(q0 == 1, c1, jnp.where(q0 == 2, c2, c3))
        )
        lb0 = _rank_select32(mq0, rsub0)
        flat0 = s0 * 128 + q0 * 32 + lb0

        # odd u16 = the NEXT emission in row order
        r1 = r0 + 1
        same_step = r1 < c4
        s1 = jnp.where(
            same_step, s0,
            jnp.minimum(jnp.take_along_axis(nes, s0, axis=1), 127),
        )
        ms1 = [
            jnp.where(same_step, g, jnp.take_along_axis(mm, s1, axis=1))
            for g, mm in zip(ms0, m)
        ]
        # same step: rank against the step's block prefixes; new step:
        # its rank is 0, so q1 = number of leading emission-free blocks
        q1_same = (
            (r1 >= c1).astype(I32)
            + (r1 >= c2).astype(I32)
            + (r1 >= c3).astype(I32)
        )
        u01 = ms1[0] | ms1[1]
        q1_diff = (
            (ms1[0] == 0).astype(I32)
            + (u01 == 0).astype(I32)
            + ((u01 | ms1[2]) == 0).astype(I32)
        )
        q1 = jnp.where(same_step, q1_same, q1_diff)
        m1 = ms1[0]
        for qq in range(1, 4):
            m1 = jnp.where(q1 == qq, ms1[qq], m1)
        # same block: next set bit after lb0 (lb0 = 31 can't be same-block
        # — there would be no later bit); otherwise first set bit of m1
        # (rank 0 in its block by construction, both in-step and new-step)
        above = mq0 >> ((lb0 + 1) & 31).astype(U32)
        nxt = lb0 + 1 + _ctz32(above)
        lb1 = jnp.where(
            same_step & (q1 == q0), nxt, _ctz32(m1)
        )
        flat1 = s1 * 128 + q1 * 32 + lb1
        valid0 = w0 < nw
        valid1 = (w0 + 1) < nw
        fc0 = flat0 >> 8
        fc1 = flat1 >> 8
        CC = 4 * STEPS_PER_BLOCK * WARP_SIZE // 256  # 64 source chunks
        c_lo = jnp.minimum(
            jnp.min(jnp.where(valid0, fc0, CC - 1)),
            jnp.min(jnp.where(valid1, fc1, CC - 1)),
        )
        c_hi = jnp.maximum(
            jnp.max(jnp.where(valid0, fc0, 0)),
            jnp.max(jnp.where(valid1, fc1, 0)),
        )

        def fetch(flat, fchunk):
            # a 256-u16 output chunk covers >= 2 steps = >= 2 source
            # chunks; 4 static reads cover the dense case, the fori tail
            # covers sparse rows whose emissions spread over many steps
            fl = (flat >> 1) & 127
            w32 = jnp.zeros((G4, 128), U32)
            for t in range(4):
                c = jnp.minimum(c_lo + t, CC - 1)
                g = jnp.take_along_axis(words_ref[c], fl, axis=1)
                w32 = jnp.where(fchunk == c_lo + t, g, w32)
            ws[...] = w32

            @pl.when(c_hi - c_lo >= 4)
            def _():
                def rd(c, _):
                    g = jnp.take_along_axis(words_ref[c], fl, axis=1)
                    ws[...] = jnp.where(fchunk == c, g, ws[...])
                    return 0

                jax.lax.fori_loop(c_lo + 4, c_hi + 1, rd, 0, unroll=False)

            v = ws[...]
            return jnp.where((flat & 1) == 1, v >> U32(16), v & U32(0xFFFF))

        lo16 = jnp.where(valid0, fetch(flat0, fc0), U32(0))
        hi16 = jnp.where(valid1, fetch(flat1, fc1), U32(0))
        out_ref[...] = lo16 | (hi16 << U32(16))

    @pl.when(base >= nwmax_ref[cell])
    def _():
        out_ref[...] = jnp.zeros((G4, 128), U32)


def fused_stream_geometry(B: int, padded_w: int, native: bool):
    """(k1 words-per-stream, stride streams-per-member, cap_words) of the
    stream staging buffer encode_blocks_fused(return_ref=True) hands back:
    member b's stream s starts at ref word (b*stride + s) * k1."""
    WPB = BLOCK_SIZE // 4
    NB = padded_w // WPB
    NB4 = -(-NB // 4) * 4
    NBF = B * NB4
    G = 256 if NBF >= 256 else max(8, -(-NBF // 8) * 8)
    G4 = G // 4
    NBP = -(-NBF // G) * G
    CELLS = NBP // G
    if native:
        k1 = _NCHR * 128
        return k1, NB4 // 4, CELLS * G4 * k1
    k1 = _NCH * 128
    return k1, NB4, CELLS * G * k1


@functools.partial(
    jax.jit,
    static_argnames=("prob_bits", "native", "interpret", "return_ref"),
)
def encode_blocks_fused(
    x32: jax.Array,
    sizes: jax.Array,
    packed_table: jax.Array,
    magic_table: jax.Array,
    prob_bits: int,
    native: bool = False,
    interpret: bool = False,
    return_ref: bool = False,
):
    """Pallas path of ops.rans_encode.encode_blocks (same contract).

    x32: uint32[B, NB*1024] packed symbol bytes (zero-padded);
    sizes int32[B] (bytes); packed_table/magic_table: uint32[B, 256].

    Returns (states uint32[B, NB, 32], streams32 uint32[B, NB, SOW],
    num_words int32[B, NB]). With native=True the streams are compacted
    per ROW of 4 blocks in the ROW-STREAM interleaved order
    (ops.rans_encode.encode_blocks_rows contract): streams32 is
    uint32[B, NR, 4*SOW] with NR = ceil(NB/4).

    Block space is FLAT across the batch: every member's blocks (padded to
    a multiple of 4 so kernel rows never straddle members) are concatenated
    and tiled into shared G-block cells with per-row encode tables. A
    128-member batch of 32-block rows fills (G4, 128) vectors exactly like
    one 4096-block member — the reference's batch regime
    (dietgpu/benchmark.py:151-223) costs the same per byte as bs=1.
    """
    B, padded_w = x32.shape
    WPB = BLOCK_SIZE // 4
    NB = padded_w // WPB
    NB4 = -(-NB // 4) * 4  # per-member block count, row-aligned
    NBF = B * NB4  # flat block count
    G = 256 if NBF >= 256 else max(8, -(-NBF // 8) * 8)
    G4 = G // 4
    NBP = -(-NBF // G) * G
    CELLS = NBP // G

    xf = jnp.pad(x32, ((0, 0), (0, (NB4 - NB) * WPB))).reshape(
        1, NBF * WPB
    )
    xp = jnp.pad(xf, ((0, 0), (0, (NBP - NBF) * WPB)))
    # phase-A symbol layout is the NATURAL block order [cell, g4, q, j,
    # lane] (a free reshape — no data movement); the kernel rebuilds each
    # 4-step slab in VMEM (see _encode_kernel).
    sym = xp.reshape(CELLS, G4, 4, _NJ, 128)

    blk = jnp.arange(NB4, dtype=I32)[None, :]
    valid_n = jnp.clip(
        sizes.astype(I32)[:, None] - blk * BLOCK_SIZE, 0, BLOCK_SIZE
    )  # (B, NB4); member-padding blocks clip to 0 = dead
    vnf = jnp.pad(valid_n.reshape(1, NBF), ((0, 0), (0, NBP - NBF)))
    # (CELLS, G4, 128): per-lane copy of its block's byte count
    vn = (
        vnf.reshape(CELLS, G4, 4, 1)
        .repeat(32, axis=3)
        .reshape(CELLS, G4, 128)
    )

    # per-ROW tables: kernel row r (4 blocks) belongs to member 4r//NB4
    rows = NBP // 4
    row_member = jnp.minimum(
        (jnp.arange(rows, dtype=I32) * 4) // NB4, B - 1
    )
    tab2 = (
        jnp.take(packed_table.reshape(B, 2, 128), row_member, axis=0)
        .reshape(CELLS, G4, 2, 128)
        .transpose(0, 2, 1, 3)
    )  # (CELLS, 2, G4, 128)
    mag2 = (
        jnp.take(magic_table.reshape(B, 2, 128), row_member, axis=0)
        .reshape(CELLS, G4, 2, 128)
        .transpose(0, 2, 1, 3)
    )

    cells = CELLS
    grid_a = (1, CELLS, _NJ)

    if native:
        w_spec = pl.BlockSpec(
            (None, _UNROLL // 2, G4, 128),
            lambda b, t, j: (b * cells + t, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
        w_shape = jax.ShapeDtypeStruct(
            (CELLS, _NJ * (_UNROLL // 2), G4, 128), U32
        )
    else:
        w_spec = pl.BlockSpec(
            (None, 2, G4, 4, 128),
            lambda b, t, j: (b * cells + t, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        w_shape = jax.ShapeDtypeStruct((CELLS, 2 * _NJ, G4, 4, 128), U32)

    words_d, masks_d, st_d, nw_d = pallas_call(
        functools.partial(
            _encode_kernel, prob_bits=prob_bits, G4=G4, native=native
        ),
        grid=grid_a,
        in_specs=[
            pl.BlockSpec(
                (None, G4, 4, _NJ, 128),
                lambda b, t, j: (b * cells + t, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 2, G4, 128), lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 2, G4, 128), lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            w_spec,
            pl.BlockSpec(
                (None, None, G4, _UNROLL * 4),
                lambda b, t, j: (b * cells + t, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 4), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            w_shape,
            jax.ShapeDtypeStruct((CELLS, _NJ, G4, _UNROLL * 4), U32),
            jax.ShapeDtypeStruct((CELLS, G4, 128), U32),
            jax.ShapeDtypeStruct((CELLS, G4, 4), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G4, 128), U32),
            pltpu.VMEM((G4, 128), I32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sym, vn, tab2, mag2)

    if native:
        # phase-A words: [cell, 64 chunks (2 steps each), g4, lane]
        words_pb = words_d.reshape(CELLS, 8 * _NJ, G4, 128)
        # masks: [cell, j, g4, u*4 + gb] -> [cell, q, g4, 128 steps]
        masks_pb = (
            masks_d.reshape(CELLS, _NJ, G4, _UNROLL, 4)
            .transpose(0, 4, 2, 1, 3)
            .reshape(CELLS, 4, G4, STEPS_PER_BLOCK)
        )
        # per-cell upper bound on emitted u16 words per ROW
        nwmax = jnp.max(
            nw_d.reshape(CELLS, G4, 4).sum(axis=2), axis=1
        ).astype(I32)

        grid_b = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, CELLS, _NCHR),
            in_specs=[
                pl.BlockSpec(
                    (None, 8 * _NJ, G4, 128),
                    lambda b, t, c, nw_: (b * cells + t, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (None, 4, G4, STEPS_PER_BLOCK),
                    lambda b, t, c, nw_: (b * cells + t, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (None, G4, 128),
                lambda b, t, c, nw_: (b * cells + t, 0, c),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((G4, 128), I32),
                pltpu.VMEM((G4, 128), U32),
                pltpu.VMEM((G4, 128), I32),
                pltpu.VMEM((G4, 128), U32),
            ],
        )
        # one spare cell of DMA slack (>= 80 rows) so the archive merge can
        # window-read past the last row stream without a padding copy
        streams_t = pallas_call(
            functools.partial(_compact_kernel_rows, G4=G4),
            grid_spec=grid_b,
            out_shape=jax.ShapeDtypeStruct((CELLS + 1, G4, _NCHR * 128), U32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(nwmax, words_pb, masks_pb)

        NR = NB4 // 4
        if return_ref:
            # stream staging handed back IN PLACE for the archive merge;
            # fused_stream_geometry gives (k1, stride, cap) for addressing
            ref2d = streams_t.reshape(-1, 128)
            num_words = (
                nw_d.reshape(1, NBP)[:, :NBF].reshape(B, NB4)[:, :NB]
            )
            states = (
                st_d.reshape(CELLS, G4, 4, 32)
                .reshape(1, NBP, 32)[:, :NBF]
                .reshape(B, NB4, 32)[:, :NB]
            )
            return states, ref2d, num_words
        streams32 = streams_t[:CELLS].reshape(1, NBP // 4, _NCHR * 128)[
            :, : NBF // 4
        ].reshape(B, NR, _NCHR * 128)
    else:
        # phase-A words are chunk-major u16 pairs: [cell, chunk, g, lane]
        words_pb = words_d.reshape(CELLS, 16, G, 128)
        # masks: [cell, j, g4, u*4 + gb] -> [cell, g, 128 steps]
        masks_pb = (
            masks_d.reshape(CELLS, _NJ, G4, _UNROLL, 4)
            .transpose(0, 2, 4, 1, 3)
            .reshape(CELLS, G, STEPS_PER_BLOCK)
        )

        # per-cell upper bound on emitted u16 words (phase-B early-out)
        nwmax = jnp.max(nw_d.reshape(CELLS, G), axis=1).astype(I32)

        grid_b = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, CELLS, _NCH),
            in_specs=[
                pl.BlockSpec(
                    (None, 16, G, 128),
                    lambda b, t, c, nw_: (b * cells + t, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (None, G, STEPS_PER_BLOCK),
                    lambda b, t, c, nw_: (b * cells + t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (None, G, 128),
                lambda b, t, c, nw_: (b * cells + t, 0, c),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((G, 128), I32),
                pltpu.VMEM((G, 128), I32),
                pltpu.VMEM((G, 128), U32),
            ],
        )
        streams_t = pallas_call(
            functools.partial(_compact_kernel, G=G),
            grid_spec=grid_b,
            out_shape=jax.ShapeDtypeStruct((CELLS + 1, G, _NCH * 128), U32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(nwmax, words_pb, masks_pb)

        if return_ref:
            ref2d = streams_t.reshape(-1, 128)
            num_words = (
                nw_d.reshape(1, NBP)[:, :NBF].reshape(B, NB4)[:, :NB]
            )
            states = (
                st_d.reshape(CELLS, G4, 4, 32)
                .reshape(1, NBP, 32)[:, :NBF]
                .reshape(B, NB4, 32)[:, :NB]
            )
            return states, ref2d, num_words
        streams32 = streams_t[:CELLS].reshape(1, NBP, _NCH * 128)[
            :, :NBF
        ].reshape(B, NB4, _NCH * 128)[:, :NB]

    # states back to (B, NB, 32): [cell, g4, gb*32+lb] -> [b, nb, 32]
    states = (
        st_d.reshape(CELLS, G4, 4, 32)
        .reshape(1, NBP, 32)[:, :NBF]
        .reshape(B, NB4, 32)[:, :NB]
    )
    num_words = nw_d.reshape(1, NBP)[:, :NBF].reshape(B, NB4)[:, :NB]
    return states, streams32, num_words
