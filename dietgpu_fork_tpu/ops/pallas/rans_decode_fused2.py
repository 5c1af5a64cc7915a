"""Fused Pallas rANS decoder, v2: gather-lean, latency-tolerant.

Redesign of rans_decode_fused driven by measured v5e op costs (independent
lane-gathers ~26 cyc, dependent ~78 cyc, rolls ~14 cyc, elementwise ~free):
the hot loop's cost is gather count and gather latency, so v2 cuts both.

Changes vs v1 (see that module for the base scheme; reference hot loop:
GpuANSDecode.cuh:56-105):

* Two-level LUT. The 2^pb-entry LUT (8 gather+select rounds at pb=10)
  becomes slot->sym (4 syms packed per u32: 2^pb/4 words, 2 rounds at
  pb=10) followed by sym->(pdf | cdf<<16) (256 entries, 2 rounds); the
  state update uses state' = pdf*(state>>pb) + (sbar - cdf), which equals
  the v1 LUT's pdf*(state>>pb) + smc.
* END-ALIGNED lane-group stream staging. Block (r, q)'s u32 stream word w
  sits at chunk (ofs+w)>>5, lane q*32 + ((ofs+w)&31) with ofs = SW - cw32:
  every block's stream ends at the staging top, so at a given step all
  blocks' read cursors sit near the SAME chunk regardless of per-block
  compressed size. The renorm gather loops over a small adaptive window
  [lo, hi] of 32-word chunks: hi/mn are two in-kernel reductions per 8
  steps, and lo decays by the worst-case consumption (16 u32/step). This
  replaces v1's fixed scan over every stream chunk x 4 lane groups.
* MXU ballot. The reverse-ballot suffix sum and the per-block read total
  (GpuANSDecode.cuh:89-104) are one (G4,128)x(128,256) f32 matmul against
  a constant 0/1 matrix (counts <= 32, exact in f32) instead of five
  rolls + a gather.
* Bigger cells (default G=512 blocks) amortize gather/matmul latency over
  more vector rows.

The same walk can emit JOINED 16-bit floats (fused decode+join, the
reference's JoinFloatWriter path, GpuFloatDecompress.cuh:709-884): with
one exponent byte and one raw byte per float, the packed symbol words and
the block-major raw-section words line up 1:1, so the epilogue interleaves
them into final float words and the separate join pass (plus its HBM round
trip) disappears. bf16 applies the rotate-right-1 during the walk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import pallas_call

from ...core.constants import (
    ANS_MIN_STATE,
    BLOCK_SIZE,
    STEPS_PER_BLOCK,
    WARP_SIZE,
)

I32 = jnp.int32
U32 = jnp.uint32
F32 = jnp.float32

_UNROLL = 16
_NJ = STEPS_PER_BLOCK // _UNROLL  # 8
_REBOUND = 4  # recompute the renorm window every 4 steps
_FAST = 3  # statically unrolled renorm read chunks (window beyond -> fori)

JOIN_NONE = 0  # emit packed symbol bytes (plain ANS decode)
JOIN_F16 = 1  # emit (raw | sym<<8) u16 floats
JOIN_BF16 = 2  # emit (raw | ror1(sym)<<8) u16 floats
JOIN_F32 = 3  # emit ror1(low16 | sec2<<16 | sym<<24) u32 floats


def _pack_weights():
    """(512, 256) f32 byte->word packing for a _REBOUND(=4)-step group of
    decoded symbol bytes: column 32*du + 8*q + w accumulates
    sym[step du][lane 32q + 4w + pos] * 256^pos for pos < 2 (the word's low
    u16); column 128 + 32*du + 8*q + w the same for pos >= 2 (high u16).
    One K=512 MXU dot replaces the per-step roll + two lane gathers the
    byte packing used to cost (values <= 65535, exact in f32)."""
    k = jax.lax.broadcasted_iota(I32, (512, 256), 0)
    c = jax.lax.broadcasted_iota(I32, (512, 256), 1)
    du = k >> 7
    l = k & 127
    col = 32 * du + ((l >> 5) << 3) + ((l & 31) >> 2) + 128 * ((l & 3) >> 1)
    wgt = jnp.where((l & 1) == 1, 256.0, 1.0)
    return jnp.where(c == col, wgt, 0.0).astype(jnp.bfloat16)


def _suffix_weights(row: bool = False):
    """(128, 256) f32. Classic: cols 0..127 = within-32-group inclusive
    suffix sum, cols 128..255 = 32-group total (one cursor per block).
    Row-stream: the suffix/total span all 128 lanes (ONE cursor per row of
    4 blocks — the native layout's reverse-read order). Counts <= 128,
    exact in f32."""
    r = jax.lax.broadcasted_iota(I32, (128, 256), 0)
    c = jax.lax.broadcasted_iota(I32, (128, 256), 1)
    cl = c & 127
    if row:
        take = ((c < 128) & (r >= cl)) | (c >= 128)
    else:
        same = (r >> 5) == (cl >> 5)
        take = same & ((c >= 128) | (r >= cl))
    return jnp.where(take, 1.0, 0.0).astype(F32)


def _decode_kernel2(
    st_ref, cw_ref, uw_ref, sym4_ref, stab_ref, stream_ref, *rest,
    prob_bits: int, G4: int, SW: int, SLC: int, join: int,
    row: bool = False, wide: bool = True,
):
    if join == JOIN_NONE:
        out_ref = rest[0]
        states_s, ptr_s, w32_s = rest[1], rest[2], rest[3]
        raw_ref = sec2_ref = None
    elif join in (JOIN_F16, JOIN_BF16):
        raw_ref, out_ref = rest[0], rest[1]
        states_s, ptr_s, w32_s = rest[2], rest[3], rest[4]
        sec2_ref = None
    else:  # JOIN_F32: two raw sections
        raw_ref, sec2_ref, out_ref = rest[0], rest[1], rest[2]
        states_s, ptr_s, w32_s = rest[3], rest[4], rest[5]

    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        states_s[...] = st_ref[...]
        ptr_s[...] = cw_ref[...]

    uw = uw_ref[...]  # (G4, 128) i32 per-block byte counts (per lane)
    cw = cw_ref[...]  # (G4, 128) i32 per-block (or per-ROW) u16 word counts
    states = states_s[...]
    ptr = ptr_s[...]

    lane = jax.lax.broadcasted_iota(I32, (G4, 128), 1)
    gl = lane & 31
    q32 = lane - gl
    r = ((uw - 1) % WARP_SIZE) + 1
    nsteps = -(-uw // WARP_SIZE)
    mask = U32((1 << prob_bits) - 1)
    ofs32 = SW - ((cw + 1) >> 1)
    live = uw > 0
    W = _suffix_weights(row)

    # PER-ROW tables (each G4 row's 4 blocks share one member): lets one
    # cell span many batch members — the reference's bs=128 regime decodes
    # with the same full-width vectors as bs=1
    sym4_bc = [sym4_ref[c] for c in range(SLC)]
    stab_bc = [stab_ref[c] for c in range(2)]

    def one_step(i, du, states, ptr, hi_c, mn):
        k = i - (STEPS_PER_BLOCK - nsteps)
        active = (k >= 0) & live
        lane_valid = active & ((k > 0) | (gl < r))

        sbar = states & mask
        sidx = (sbar >> U32(2)).astype(I32)
        slane = sidx & 127
        schunk = sidx >> 7
        w = jnp.take_along_axis(sym4_bc[0], slane, axis=1)
        for c in range(1, SLC):
            g = jnp.take_along_axis(sym4_bc[c], slane, axis=1)
            w = jnp.where(schunk == c, g, w)
        rk = (w >> ((sbar & U32(3)) << U32(3))) & U32(0xFF)

        # rank-permuted second level: the slot table yields frequency
        # RANKS and rtab is ordered by descending pdf, so members with
        # <= 128 distinct symbols (every float exponent plane) resolve the
        # 256-entry lookup with ONE gather; the statically-compiled `wide`
        # variant (chosen by one XLA-level cond on `big`) adds the chunk-1
        # gather + select for wider alphabets. A per-step in-kernel branch
        # here cost ~0.5 ms per 16Mi member; the static twin-compile is
        # free at run time.
        tl = (rk & U32(127)).astype(I32)
        e = jnp.take_along_axis(stab_bc[0], tl, axis=1)
        if wide:
            e = jnp.where(
                rk > U32(127),
                jnp.take_along_axis(stab_bc[1], tl, axis=1),
                e,
            )
        sym = e & U32(0xFF)
        cdfv = (e >> U32(8)) & U32(0x7FF)
        pdfv = e >> U32(19)
        states = jnp.where(
            lane_valid,
            pdfv * (states >> U32(prob_bits)) + sbar - cdfv,
            states,
        )

        read = lane_valid & (states < U32(ANS_MIN_STATE))
        so = jax.lax.dot_general(
            read.astype(I32).astype(F32), W,
            (((1,), (0,)), ((), ())), preferred_element_type=F32,
        )
        suffix = so[:, :128].astype(I32)
        tot = so[:, 128:].astype(I32)
        idx16 = ptr - suffix
        gidx = jnp.clip(ofs32 + (idx16 >> 1), 0, SW - 1)
        if row:
            # one shared cursor per row: full-width 128-word chunks, max
            # consumption 64 u32 per step across the row
            lane_t = gidx & 127
            c2 = gidx >> 7
            lo_c = jnp.maximum((mn - 65 - 64 * du) >> 7, 0)
        else:
            lane_t = q32 | (gidx & 31)
            c2 = gidx >> 5
            lo_c = jnp.maximum((mn - 17 - 16 * du) >> 5, 0)

        # statically unrolled window read (the common case: end-aligned
        # staging keeps every block's/row's cursor within a few chunks);
        # a dynamic fori tail covers wide windows (mixed-size cells)
        C2 = SW // (128 if row else 32)
        w32 = jnp.zeros((G4, 128), U32)
        for t in range(_FAST):
            ct = jnp.minimum(lo_c + t, C2 - 1)
            g = jnp.take_along_axis(stream_ref[ct], lane_t, axis=1)
            w32 = jnp.where(c2 == lo_c + t, g, w32)
        w32_s[...] = w32

        @pl.when(hi_c - lo_c >= _FAST)
        def _():
            def rd(c, _):
                g = jnp.take_along_axis(stream_ref[c], lane_t, axis=1)
                w32_s[...] = jnp.where(c2 == c, g, w32_s[...])
                return 0

            jax.lax.fori_loop(lo_c + _FAST, hi_c + 1, rd, 0, unroll=False)

        w32 = w32_s[...]
        val = jnp.where(
            (idx16 & 1) == 1, w32 >> U32(16), w32 & U32(0xFFFF)
        )
        states = jnp.where(read, (states << U32(16)) + val, states)
        ptr = ptr - tot
        sym = jnp.where(lane_valid, sym, U32(0))
        return states, ptr, sym

    WP = _pack_weights()
    words = []
    for grp in range(_UNROLL // _REBOUND):
        ptrg = ofs32 + (ptr >> 1)
        hi_c = jnp.max(jnp.where(live, ptrg, 0)) >> (7 if row else 5)
        mn = jnp.min(jnp.where(live, ptrg, 2 * SW))
        gsyms = []
        for du in range(_REBOUND):
            u = grp * _REBOUND + du
            states, ptr, sym = one_step(
                j * _UNROLL + u, du, states, ptr, hi_c, mn
            )
            # Mosaic has no u32->bf16 cast; go via i32 (values <= 255)
            gsyms.append(sym.astype(I32).astype(jnp.bfloat16))
        # MXU byte->word packing for the whole group (see _pack_weights);
        # result column 32*du + q*8 + w is u32 word [q*8 + w] of step du
        P = jax.lax.dot_general(
            jnp.concatenate(gsyms, axis=1), WP,
            (((1,), (0,)), ((), ())), preferred_element_type=F32,
        )
        gw = (
            P[:, :128].astype(I32) | (P[:, 128:].astype(I32) << 16)
        ).astype(U32)
        for du in range(_REBOUND):
            words.append(gw[:, 32 * du : 32 * du + 32])

    states_s[...] = states
    ptr_s[...] = ptr

    if join == JOIN_F32:
        # fp32 join as a TILE epilogue (not per step): symbol word j' of
        # block q covers floats 4j'..4j'+3 of this 512-float tile; output
        # float f = low16(sec1 u16 f) | sec2 byte f << 16 | sym byte f
        # << 24, rotated right 1 (FloatTypeInfo<kFloat32>::join,
        # GpuFloatUtils.cuh:292-302). Everything is full-width static
        # slices + 3 lane gathers per 128-float output segment — the
        # per-step 32-lane slicing this replaces was what made fused fp32
        # slower than two-pass in r2.
        b_sh = ((lane & 3) << 3).astype(U32)
        for q in range(4):
            s = jnp.concatenate(
                [w[:, q * 8 : (q + 1) * 8] for w in words[::-1]], axis=1
            )
            s1a = raw_ref[:, q, 0:128]  # sec1 words 0..127 (floats 0..255)
            s1b = raw_ref[:, q, 128:256]  # words 128..255 (floats 256..511)
            s2 = sec2_ref[:, q, :]  # (G4, 128) third-byte words
            for h in range(4):  # floats h*128 .. h*128+127 of the tile
                i4 = h * 32 + (lane >> 2)
                symb = (
                    jnp.take_along_axis(s, i4, axis=1) >> b_sh
                ) & U32(0xFF)
                i1 = (h & 1) * 64 + (lane >> 1)
                w1 = jnp.take_along_axis(s1a if h < 2 else s1b, i1, axis=1)
                low16 = jnp.where(
                    (lane & 1) == 1, w1 >> U32(16), w1 & U32(0xFFFF)
                )
                b2 = (jnp.take_along_axis(s2, i4, axis=1) >> b_sh) & U32(
                    0xFF
                )
                r = low16 | (b2 << U32(16)) | (symb << U32(24))
                out_ref[:, q, h * 128 : (h + 1) * 128] = (
                    (r >> U32(1)) | (r << U32(31))
                )
        return

    if join == JOIN_NONE:
        for q in range(4):
            out_ref[:, q, :] = jnp.concatenate(
                [w[:, q * 8 : (q + 1) * 8] for w in words[::-1]], axis=1
            )
        return

    # fused 16-bit join: symbol word j' of a block covers floats
    # 4j'..4j'+3, raw-section word j' covers the same floats' raw bytes;
    # out words 2j' and 2j'+1 interleave their bytes.
    half_idx = lane >> 1
    for q in range(4):
        s = jnp.concatenate(
            [w[:, q * 8 : (q + 1) * 8] for w in words[::-1]], axis=1
        )
        w = raw_ref[:, q, :]
        o0 = (
            (w & U32(0xFF))
            | ((s & U32(0xFF)) << U32(8))
            | ((w & U32(0xFF00)) << U32(8))
            | ((s & U32(0xFF00)) << U32(16))
        )
        wh = w >> U32(16)
        sh = s >> U32(16)
        o1 = (
            (wh & U32(0xFF))
            | ((sh & U32(0xFF)) << U32(8))
            | ((wh & U32(0xFF00)) << U32(8))
            | ((sh & U32(0xFF00)) << U32(16))
        )
        if join == JOIN_BF16:
            # bf16 stores rotl1(word) split across the two bytes; undo it
            # on the assembled u16 pairs (FloatTypeInfo<kBFloat16>::join,
            # GpuFloatUtils.cuh:238-256)
            o0 = ((o0 >> U32(1)) & U32(0x7FFF7FFF)) | (
                (o0 << U32(15)) & U32(0x80008000)
            )
            o1 = ((o1 >> U32(1)) & U32(0x7FFF7FFF)) | (
                (o1 << U32(15)) & U32(0x80008000)
            )
        odd = (lane & 1) == 1
        for h in range(2):
            idx = h * 64 + half_idx
            a = jnp.take_along_axis(o0, idx, axis=1)
            b = jnp.take_along_axis(o1, idx, axis=1)
            out_ref[:, q, h * 128 : (h + 1) * 128] = jnp.where(odd, b, a)


def _pick_g(NB: int) -> int:
    # G=512 (r4 re-measure): the decode walk is LATENCY-bound on its
    # per-step dependent-gather chain, so doubling rows per cell halves
    # invocation count at the same total step count — 0.44 -> 0.30 ms per
    # 16Mi plane vs G=256 (scratch/dec_var_r4.py, interleaved A/B). The r3
    # window-spread concern is covered by the adaptive [lo, hi] read.
    if NB >= 512:
        return 512
    return max(8, -(-NB // 8) * 8)


def _flat_geom(B: int, NB: int, G: int):
    """FLAT block space: members' blocks are concatenated (each padded to a
    multiple of 4 so no kernel row straddles members) and tiled into shared
    G-block cells — the bs=128 batch regime fills (G4,128) vectors exactly
    like one big member."""
    NB4 = -(-NB // 4) * 4
    NBF = B * NB4
    NBP = -(-NBF // G) * G
    return NB4, NBF, NBP, NBP // G


def _flatten_blocks(a, NB, NB4, NBF, NBP):
    """(B, NB, ...) -> (NBP, ...) flat block axis (zero padded)."""
    pads = [(0, 0), (0, NB4 - NB)] + [(0, 0)] * (a.ndim - 2)
    a = jnp.pad(a, pads).reshape((NBF,) + a.shape[2:])
    # NB: a is now (NBF, ...) — one fewer dim — so the pad list needs
    # a.ndim - 1 trailing no-op pairs (a single pair would broadcast to
    # every axis and silently widen the row dimension too)
    return jnp.pad(a, [(0, NBP - NBF)] + [(0, 0)] * (a.ndim - 1))


def _row_tables(sym4, symtab, NB4, NBP, G4):
    """Per-ROW decode tables: kernel row r (4 blocks) -> member 4r//NB4.
    Returns (sym4_r (CELLS, SLC, G4, 128), stab_r (CELLS, 2, G4, 128))."""
    B = sym4.shape[0]
    CELLS = NBP // (4 * G4)
    rows = NBP // 4
    row_member = jnp.minimum(
        (jnp.arange(rows, dtype=I32) * 4) // NB4, B - 1
    )
    SLC = max(1, sym4.shape[1] // 128)
    s4 = sym4 if sym4.shape[1] >= 128 else jnp.pad(
        sym4, ((0, 0), (0, 128 - sym4.shape[1]))
    )
    sym4_r = (
        jnp.take(s4.reshape(B, SLC, 128), row_member, axis=0)
        .reshape(CELLS, G4, SLC, 128)
        .transpose(0, 2, 1, 3)
    )
    stab_r = (
        jnp.take(symtab.reshape(B, 2, 128), row_member, axis=0)
        .reshape(CELLS, G4, 2, 128)
        .transpose(0, 2, 1, 3)
    )
    return sym4_r, stab_r, SLC


def _stage(streams_ea, comp_words, uncomp_words, states, G):
    """Common staging: end-aligned (B,NB,SW) -> flat-cell chunk-major."""
    B, NB, SW = streams_ea.shape
    assert SW % 32 == 0
    G4 = G // 4
    NB4, NBF, NBP, CELLS = _flat_geom(B, NB, G)
    C2 = SW // 32

    ST = (
        _flatten_blocks(streams_ea, NB, NB4, NBF, NBP)
        .reshape(CELLS, G4, 4, C2, 32)
        .transpose(0, 3, 1, 2, 4)
        .reshape(CELLS, C2, G4, 128)
    )

    def rep32(a):
        return jnp.repeat(
            a.reshape(CELLS, G4, 4, 1), 32, axis=3
        ).reshape(CELLS, G4, 128)

    cw = rep32(_flatten_blocks(comp_words.astype(I32), NB, NB4, NBF, NBP))
    uw = rep32(_flatten_blocks(uncomp_words.astype(I32), NB, NB4, NBF, NBP))
    st = _flatten_blocks(states, NB, NB4, NBF, NBP).reshape(CELLS, G4, 128)
    return ST, cw, uw, st, NB4, NBF, NBP, CELLS, C2


def _stage_rows(streams_row, comp_words, uncomp_words, states, G):
    """Row-stream staging: end-aligned (B, NR, SW) row streams -> flat-cell
    chunk-major (128-word chunks); cw carries the ROW u16 word count
    broadcast to all 128 lanes."""
    B, NR, SW = streams_row.shape
    NB = comp_words.shape[1]
    assert SW % 128 == 0
    G4 = G // 4
    NB4, NBF, NBP, CELLS = _flat_geom(B, NB, G)
    assert NB4 == 4 * NR
    C2 = SW // 128
    NRF, NRP = NBF // 4, NBP // 4

    st_f = jnp.pad(
        streams_row.reshape(B * NR, SW), ((0, NRP - B * NR), (0, 0))
    )
    ST = st_f.reshape(CELLS, G4, C2, 128).transpose(0, 2, 1, 3)

    rw = (
        jnp.pad(comp_words.astype(I32), ((0, 0), (0, NB4 - NB)))
        .reshape(B, NR, 4)
        .sum(axis=2)
    )
    rw_f = jnp.pad(rw.reshape(B * NR), (0, NRP - B * NR))
    cw = jnp.repeat(rw_f.reshape(CELLS, G4, 1), 128, axis=2)

    def rep32(a):
        return jnp.repeat(
            a.reshape(CELLS, G4, 4, 1), 32, axis=3
        ).reshape(CELLS, G4, 128)

    uw = rep32(_flatten_blocks(uncomp_words.astype(I32), NB, NB4, NBF, NBP))
    st = _flatten_blocks(states, NB, NB4, NBF, NBP).reshape(CELLS, G4, 128)
    return ST, cw, uw, st, NB4, NBF, NBP, CELLS, C2


def _unflatten(out, B, NB, NB4, NBF, NBP, X):
    """(CELLS, G4, 4, X*_NJ) kernel output -> (B, NB, X*_NJ)."""
    return out.reshape(1, NBP, out.shape[-1])[:, :NBF].reshape(
        B, NB4, out.shape[-1]
    )[:, :NB]


@functools.partial(
    jax.jit, static_argnames=("prob_bits", "row_stream", "interpret")
)
def decode_blocks_fused2(
    streams_ea: jax.Array,
    comp_words: jax.Array,
    uncomp_words: jax.Array,
    states: jax.Array,
    sym4: jax.Array,
    symtab: jax.Array,
    prob_bits: int,
    row_stream: bool = False,
    interpret: bool = False,
    big: jax.Array | None = None,
) -> jax.Array:
    """Plain ANS decode. streams_ea: uint32[B, NB, SW] END-aligned (block
    words at [SW-cw32, SW), SW % 32 == 0); (sym4, symtab, big) are the
    RANK-permuted tables from build_decode_tables_ranked: sym4 packs
    slot->rank 4/word, symtab maps rank -> (sym | cdf<<8 | pdf<<19), and
    big flags alphabets wider than 128 ranks (big=None assumes wide).
    row_stream: streams_ea is uint32[B, NR, SW] (NR = ceil(NB/4)) of
    END-aligned per-ROW native streams (SW % 128 == 0).
    Returns uint32[B, NB, BLOCK_SIZE/4] packed decoded bytes."""
    B = streams_ea.shape[0]
    NB = comp_words.shape[1]
    SW = streams_ea.shape[2]
    NB4 = -(-NB // 4) * 4
    G = _pick_g(B * NB4)
    G4 = G // 4
    ST, cw, uw, st, NB4, NBF, NBP, CELLS, C2 = (
        _stage_rows(streams_ea, comp_words, uncomp_words, states, G)
        if row_stream
        else _stage(streams_ea, comp_words, uncomp_words, states, G)
    )
    sym4_r, stab_r, SLC = _row_tables(sym4, symtab, NB4, NBP, G4)

    cells = CELLS

    def run(wide):
        return pallas_call(
        functools.partial(
            _decode_kernel2, prob_bits=prob_bits, G4=G4, SW=SW, SLC=SLC,
            join=JOIN_NONE, row=row_stream, wide=wide,
        ),
        grid=(1, CELLS, _NJ),
        in_specs=[
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, SLC, G4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 2, G4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, C2, G4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, G4, 4, 128),
            lambda b, t, j: (b * cells + t, 0, 0, _NJ - 1 - j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((CELLS, G4, 4, _NJ * 128), U32),
        scratch_shapes=[
            pltpu.VMEM((G4, 128), U32),
            pltpu.VMEM((G4, 128), I32),
            pltpu.VMEM((G4, 128), U32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(st, cw, uw, sym4_r, stab_r, ST)

    out = (
        run(True)
        if big is None
        else jax.lax.cond(
            big[0, 0] > 0, lambda: run(True), lambda: run(False)
        )
    )
    return _unflatten(out, B, NB, NB4, NBF, NBP, BLOCK_SIZE // 4)


@functools.partial(
    jax.jit, static_argnames=("prob_bits", "bf16", "row_stream", "interpret")
)
def decode_join16_fused(
    streams_ea: jax.Array,
    comp_words: jax.Array,
    uncomp_words: jax.Array,
    states: jax.Array,
    sym4: jax.Array,
    symtab: jax.Array,
    raw32: jax.Array,
    prob_bits: int,
    bf16: bool,
    row_stream: bool = False,
    interpret: bool = False,
    big: jax.Array | None = None,
) -> jax.Array:
    """Fused ANS-decode + 16-bit float join (reference RUN_FUSED,
    GpuFloatDecompress.cuh:935-972). raw32: uint32[B, NB, 1024] block-major
    raw-section words (raw word k of block nb = bytes of floats 4k..4k+3);
    (sym4, symtab, big) from build_decode_tables_ranked.
    Returns uint32[B, NB, 2048]: final float words per block."""
    B = streams_ea.shape[0]
    NB = comp_words.shape[1]
    SW = streams_ea.shape[2]
    NB4 = -(-NB // 4) * 4
    G = _pick_g(B * NB4)
    G4 = G // 4
    ST, cw, uw, st, NB4, NBF, NBP, CELLS, C2 = (
        _stage_rows(streams_ea, comp_words, uncomp_words, states, G)
        if row_stream
        else _stage(streams_ea, comp_words, uncomp_words, states, G)
    )
    sym4_r, stab_r, SLC = _row_tables(sym4, symtab, NB4, NBP, G4)
    raw_c = _flatten_blocks(raw32, NB, NB4, NBF, NBP).reshape(
        CELLS, G4, 4, _NJ * 128
    )

    cells = CELLS

    def run(wide):
        return pallas_call(
        functools.partial(
            _decode_kernel2, prob_bits=prob_bits, G4=G4, SW=SW, SLC=SLC,
            join=JOIN_BF16 if bf16 else JOIN_F16, row=row_stream, wide=wide,
        ),
        grid=(1, CELLS, _NJ),
        in_specs=[
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, SLC, G4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 2, G4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, C2, G4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, _NJ - 1 - j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, G4, 4, 256),
            lambda b, t, j: (b * cells + t, 0, 0, _NJ - 1 - j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((CELLS, G4, 4, _NJ * 256), U32),
        scratch_shapes=[
            pltpu.VMEM((G4, 128), U32),
            pltpu.VMEM((G4, 128), I32),
            pltpu.VMEM((G4, 128), U32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(st, cw, uw, sym4_r, stab_r, ST, raw_c)

    out = (
        run(True)
        if big is None
        else jax.lax.cond(
            big[0, 0] > 0, lambda: run(True), lambda: run(False)
        )
    )
    return _unflatten(out, B, NB, NB4, NBF, NBP, 2 * (BLOCK_SIZE // 4))


@functools.partial(
    jax.jit, static_argnames=("prob_bits", "row_stream", "interpret")
)
def decode_join32_fused(
    streams_ea: jax.Array,
    comp_words: jax.Array,
    uncomp_words: jax.Array,
    states: jax.Array,
    sym4: jax.Array,
    symtab: jax.Array,
    sec1_32: jax.Array,
    sec2_32: jax.Array,
    prob_bits: int,
    row_stream: bool = False,
    interpret: bool = False,
    big: jax.Array | None = None,
) -> jax.Array:
    """Fused ANS-decode + fp32 join (reference RUN_FUSED for kFloat32,
    GpuFloatDecompress.cuh:935-972). sec1_32: uint32[B, NB, 2048]
    block-major low-u16 pairs; sec2_32: uint32[B, NB, 1024] block-major
    third bytes; (sym4, symtab, big) from build_decode_tables_ranked.
    Returns uint32[B, NB, 4096]: final fp32 words."""
    B = streams_ea.shape[0]
    NB = comp_words.shape[1]
    SW = streams_ea.shape[2]
    NB4 = -(-NB // 4) * 4
    G = _pick_g(B * NB4)
    G4 = G // 4
    ST, cw, uw, st, NB4, NBF, NBP, CELLS, C2 = (
        _stage_rows(streams_ea, comp_words, uncomp_words, states, G)
        if row_stream
        else _stage(streams_ea, comp_words, uncomp_words, states, G)
    )
    sym4_r, stab_r, SLC = _row_tables(sym4, symtab, NB4, NBP, G4)
    s1c = _flatten_blocks(sec1_32, NB, NB4, NBF, NBP).reshape(
        CELLS, G4, 4, _NJ * 256
    )
    s2c = _flatten_blocks(sec2_32, NB, NB4, NBF, NBP).reshape(
        CELLS, G4, 4, _NJ * 128
    )

    cells = CELLS

    def run(wide):
        return pallas_call(
        functools.partial(
            _decode_kernel2, prob_bits=prob_bits, G4=G4, SW=SW, SLC=SLC,
            join=JOIN_F32, row=row_stream, wide=wide,
        ),
        grid=(1, CELLS, _NJ),
        in_specs=[
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, SLC, G4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 2, G4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, C2, G4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 4, 256),
                lambda b, t, j: (b * cells + t, 0, 0, _NJ - 1 - j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 4, 128),
                lambda b, t, j: (b * cells + t, 0, 0, _NJ - 1 - j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, G4, 4, 512),
            lambda b, t, j: (b * cells + t, 0, 0, _NJ - 1 - j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((CELLS, G4, 4, _NJ * 512), U32),
        scratch_shapes=[
            pltpu.VMEM((G4, 128), U32),
            pltpu.VMEM((G4, 128), I32),
            pltpu.VMEM((G4, 128), U32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(st, cw, uw, sym4_r, stab_r, ST, s1c, s2c)

    out = (
        run(True)
        if big is None
        else jax.lax.cond(
            big[0, 0] > 0, lambda: run(True), lambda: run(False)
        )
    )
    return _unflatten(out, B, NB, NB4, NBF, NBP, 4 * (BLOCK_SIZE // 4))
