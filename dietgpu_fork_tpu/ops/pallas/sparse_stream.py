"""Pallas sparse stream expansion by nonzero bitmap.

The reference scatters through per-thread addresses after a device-wide
exclusive scan (fill_in_nonzeros, GpuSparseFloatDecompress.cuh:69-145).
TPU has neither scatter nor fast data-dependent gather in XLA, so:

* the bit-level scan is factored: per-bitmap-word popcounts + exclusive
  cumsum happen in plain XLA on the (tiny, n/32) word array; the in-word
  prefix is SWAR popcount math in the kernel;
* each 8192-float cell gathers its values from a VMEM window of the
  compact stream — bounded because ranks are monotone — and only the
  chunks the cell's population actually reaches are DMA'd and scanned
  (scalar-prefetched per-cell base/count).

Word-granular: fp32 uses pair=1 (1 word/float), fp64 pair=2 (lo+hi).
16-bit types keep the portable XLA path.

Bit order here is PLAIN lsb-first within each uint32; the archive's
MSB-first-per-byte bitmap is converted by `bitrev8_words`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import pallas_call

I32 = jnp.int32
U32 = jnp.uint32

_CW = 8192  # floats per grid cell
_CBW = _CW // 32  # bitmap words per cell (256)
_R = _CW // 128  # float rows per cell (64)
_WINC = (2 * _CW + 1024 + 1024) // 1024  # window 1Ki-word chunks (pair<=2)
_WIN = _WINC * 1024


def popcount32(x):
    x = x - ((x >> U32(1)) & U32(0x55555555))
    x = (x & U32(0x33333333)) + ((x >> U32(2)) & U32(0x33333333))
    x = (x + (x >> U32(4))) & U32(0x0F0F0F0F)
    return ((x * U32(0x01010101)) >> U32(24)).astype(I32)


def bitrev8_words(w):
    """Reverse the bit order within every byte of uint32 lanes (archive
    bitmaps are MSB-first per byte, GpuSparseFloatCompress.cuh:64-113)."""
    w = w.astype(U32)
    w = ((w >> U32(4)) & U32(0x0F0F0F0F)) | ((w & U32(0x0F0F0F0F)) << U32(4))
    w = ((w >> U32(2)) & U32(0x33333333)) | ((w & U32(0x33333333)) << U32(2))
    w = ((w >> U32(1)) & U32(0x55555555)) | ((w & U32(0x55555555)) << U32(1))
    return w


def _expand_kernel(
    base_ref, nchd_ref, nz_ref, bm_ref, wr_ref, out_ref,
    win, sem, *, pair: int, NZR: int,
):
    """pair=1: one word per float (fp32); pair=2: (lo, hi) pairs (fp64);
    pair=0: HALF mode — u16 items packed two per word (bf16/fp16)."""
    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    base = base_ref[cell]
    base_w = (base * pair) if pair else (base // 2)  # window start, words
    w0 = base_w // 1024 * 1024
    off = base_w - w0
    nchd = nchd_ref[cell]  # 1024-word DMA chunks to fetch
    rowbase = pl.program_id(0) * NZR + w0 // 128

    def fetch(c, _):
        pltpu.make_async_copy(
            nz_ref.at[pl.ds(rowbase + c * 8, 8), :],
            win.at[pl.ds(c * 8, 8), :],
            sem,
        ).start()
        return 0

    jax.lax.fori_loop(0, nchd, fetch, 0, unroll=False)

    # per-float bit + in-cell exclusive rank while the DMAs fly
    l = jax.lax.broadcasted_iota(I32, (_R, 128), 1)
    row = jax.lax.broadcasted_iota(I32, (_R, 128), 0)
    widx = row * 4 + (l >> 5)  # in [0, 256)
    bm = bm_ref[...]  # (2, 128)
    wr = wr_ref[...]

    def g2(tab, idx):
        g0 = jnp.take_along_axis(
            jnp.broadcast_to(tab[0][None, :], (_R, 128)), idx & 127, axis=1
        )
        g1 = jnp.take_along_axis(
            jnp.broadcast_to(tab[1][None, :], (_R, 128)), idx & 127, axis=1
        )
        return jnp.where(idx < 128, g0, g1)

    w = g2(bm, widx)
    wr_f = g2(wr, widx).astype(I32)
    bitpos = (l & 31).astype(U32)
    is_set = ((w >> bitpos) & U32(1)) == 1
    below = popcount32(w & ((U32(1) << bitpos) - U32(1)))
    excl = wr_f - base + below

    def wait(c, _):
        pltpu.make_async_copy(
            nz_ref.at[pl.ds(rowbase, 8), :], win.at[pl.ds(0, 8), :], sem
        ).wait()
        return 0

    jax.lax.fori_loop(0, nchd, wait, 0, unroll=False)

    gidx = excl * pair + off

    def gather_win(idx):
        lane_i = idx & 127
        chunk_i = idx >> 7

        def body(c, acc):
            g = jnp.take_along_axis(
                jnp.broadcast_to(win[c][None, :], (_R, 128)), lane_i, axis=1
            )
            return jnp.where(chunk_i == c, g, acc)

        # typical windows are 1-2 DMA chunks (16 x 128-row sub-chunks):
        # unroll that statically, keep a dynamic fori tail for wide
        # (low-density) windows — same shape as the rANS decoder's
        # adaptive renorm window
        acc = jnp.zeros((_R, 128), U32)
        for c in range(16):
            acc = body(c, acc)
        return jax.lax.cond(
            nchd * 8 > 16,
            lambda a: jax.lax.fori_loop(16, nchd * 8, body, a,
                                        unroll=False),
            lambda a: a,
            acc,
        )

    if pair == 1:
        val = gather_win(gidx)
        out_ref[...] = jnp.where(is_set, val, U32(0))
    elif pair == 2:
        lo = jnp.where(is_set, gather_win(gidx), U32(0))
        hi = jnp.where(is_set, gather_win(gidx + 1), U32(0))
        m = l >> 1
        for t in range(2):
            idx = 64 * t + m
            ol = jnp.take_along_axis(lo, idx, axis=1)
            oh = jnp.take_along_axis(hi, idx, axis=1)
            out_ref[:, t, :] = jnp.where((l & 1) == 1, oh, ol)
    else:
        # HALF mode: item rank g = base + excl; u16 item at word g>>1,
        # half g&1; combine float pairs (2j, 2j+1) into output words
        g = base + excl
        wv = gather_win((g >> 1) - w0)
        v16 = (wv >> ((g & 1).astype(U32) * U32(16))) & U32(0xFFFF)
        v16 = jnp.where(is_set, v16, U32(0))
        # floats 2j / 2j+1 of out word j live at flat float lanes 2j, 2j+1:
        # slab-deinterleave the (R, 128) float tile pairs
        v2 = v16.reshape(_R // 2, 2, 128)
        lo2 = jax.lax.broadcasted_iota(I32, (_R // 2, 128), 1)
        sel = lo2 >> 6
        e = jnp.take_along_axis(v2[:, 0, :], (2 * lo2) & 127, axis=1)
        e1 = jnp.take_along_axis(v2[:, 1, :], (2 * lo2) & 127, axis=1)
        e = jnp.where(sel == 1, e1, e)
        o = jnp.take_along_axis(v2[:, 0, :], (2 * lo2 + 1) & 127, axis=1)
        o1 = jnp.take_along_axis(v2[:, 1, :], (2 * lo2 + 1) & 127, axis=1)
        o = jnp.where(sel == 1, o1, o)
        out_ref[...] = e | (o << U32(16))


def _compact_kernel(x_ref, bm_ref, wr_ref, out_ref, *, pair: int):
    """Local rank-select compaction of one 8192-float cell into dense
    staging (slot j = j-th set bit's value); a runs-merge glues cells."""
    bm = bm_ref[...]  # (2, 128) lsb-first bitmap words
    wr = wr_ref[...]  # (2, 128) IN-CELL exclusive word ranks
    l = jax.lax.broadcasted_iota(I32, (_R, 128), 1)

    # binary search: word w* = last of 256 with wr[w] <= slot j
    j = jax.lax.broadcasted_iota(I32, (_R, 128), 0) * 128 + l

    def g2(tab, idx):
        g0 = jnp.take_along_axis(
            jnp.broadcast_to(tab[0][None, :], (_R, 128)), idx & 127, axis=1
        )
        g1 = jnp.take_along_axis(
            jnp.broadcast_to(tab[1][None, :], (_R, 128)), idx & 127, axis=1
        )
        return jnp.where(idx < 128, g0, g1)

    lo = jnp.zeros((_R, 128), I32)
    for w in (128, 64, 32, 16, 8, 4, 2, 1):
        mid = jnp.minimum(lo + w, 255)
        probe = g2(wr, mid).astype(I32)
        lo = jnp.where(probe <= j, mid, lo)
    w_star = lo
    r_in = j - g2(wr, w_star).astype(I32)
    m = g2(bm, w_star)

    # bit index of the r_in-th set bit of m (popcount descent)
    pos = jnp.zeros((_R, 128), I32)
    rem = r_in
    for w in (16, 8, 4, 2, 1):
        low = (m >> pos.astype(U32)) & ((U32(1) << U32(w)) - U32(1))
        c = popcount32(low)
        go = rem >= c
        pos = jnp.where(go, pos + w, pos)
        rem = jnp.where(go, rem - c, rem)
    f = w_star * 32 + pos  # source float index within the cell

    def gather_cell(idx):
        lane_i = idx & 127
        chunk_i = idx >> 7

        def body(c, acc):
            g = jnp.take_along_axis(
                jnp.broadcast_to(x_ref[c][None, :], (_R, 128)),
                lane_i, axis=1,
            )
            return jnp.where(chunk_i == c, g, acc)

        # static chunk count: fully unrolled — the rolled fori's loop
        # machinery (~170 cyc/iteration) dominated the whole compact
        # kernel at 32 iterations per cell
        return jax.lax.fori_loop(
            0, x_ref.shape[0], body, jnp.zeros((_R, 128), U32),
            unroll=True,
        )

    if pair == 1:
        out_ref[...] = gather_cell(f)
    elif pair == 2:
        lo_w = gather_cell(2 * f)
        hi_w = gather_cell(2 * f + 1)
        mm = l >> 1
        for t in range(2):
            idx = 64 * t + mm
            ol = jnp.take_along_axis(lo_w, idx, axis=1)
            oh = jnp.take_along_axis(hi_w, idx, axis=1)
            out_ref[:, t, :] = jnp.where((l & 1) == 1, oh, ol)
    else:
        # HALF mode: one u16 item per slot, staged one-per-u32-lane (a
        # global runs-merge then a pair-pack kernel produce the stream)
        wv = gather_cell(f >> 1)
        out_ref[...] = (wv >> ((f & 1).astype(U32) * U32(16))) & U32(0xFFFF)


@functools.partial(jax.jit, static_argnames=("n_floats", "pair"))
def compact_by_bitmap(
    data32: jax.Array,
    bitmap32: jax.Array,
    n_floats: int,
    pair: int = 1,
):
    """Gather the words of bitmap-set floats to the front, order preserved
    (the reference's fill_comp_input scatter). data32: uint32[B, NW] with
    pair words per float; bitmap32 lsb-first. Returns (compact uint32[B,
    pair*ceil_to_cell(n)], nnz int32[B])."""
    from .merge import runs_merge

    B = data32.shape[0]
    NF = -(-n_floats // _CW) * _CW
    T = NF // _CW
    NBW = NF // 32

    bm = jnp.pad(
        bitmap32[:, : min(bitmap32.shape[1], NBW)],
        ((0, 0), (0, max(NBW - bitmap32.shape[1], 0))),
    )
    if n_floats < NF:
        wpos = jnp.arange(NBW, dtype=I32)[None, :]
        rem = jnp.clip(n_floats - wpos * 32, 0, 32).astype(U32)
        bm = bm & jnp.where(
            rem >= 32, U32(0xFFFFFFFF), (U32(1) << rem) - U32(1)
        )

    pc = popcount32(bm)
    incl = jnp.cumsum(pc, axis=1)
    wr = (incl - pc).astype(I32)
    nnz = incl[:, -1].astype(I32)

    base = wr.reshape(B, T, _CBW)[:, :, 0]  # (B, T) global cell bases
    lwr = (wr.reshape(B, T, _CBW) - base[:, :, None]).reshape(B * T, 2, 128)
    bm_in = bm.reshape(B * T, 2, 128)

    xrows = pair * _R if pair else _R // 2  # data words per cell / 128
    xw = jnp.pad(
        data32, ((0, 0), (0, xrows * 128 * T - data32.shape[1]))
    ) if data32.shape[1] < xrows * 128 * T else data32[:, : xrows * 128 * T]
    x_in = xw.reshape(B * T, xrows, 128)
    x_spec = pl.BlockSpec(
        (None, xrows, 128), lambda b, t: (b * T + t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if pair != 2:
        out_block = pl.BlockSpec(
            (None, _R, 128), lambda b, t: (b * T + t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B * T, _R, 128), U32)
    else:
        out_block = pl.BlockSpec(
            (None, _R, 2, 128), lambda b, t: (b * T + t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B * T, _R, 2, 128), U32)

    staging = pallas_call(
        functools.partial(_compact_kernel, pair=pair),
        grid=(B, T),
        in_specs=[
            x_spec,
            pl.BlockSpec(
                (None, 2, 128), lambda b, t: (b * T + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 2, 128), lambda b, t: (b * T + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_block,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(x_in, bm_in, lwr)

    # glue cells: per (member, cell) run into the member's compact row.
    # pair=0 merges at ITEM granularity (one u32 lane per u16 item) and a
    # pair-pack kernel then forms the u16 stream.
    upf = pair if pair else 1  # staged u32 units per item
    CWp = upf * NF
    b_ar = jnp.arange(B, dtype=I32)[:, None]
    t_ar = jnp.arange(T, dtype=I32)[None, :]
    cnt = (
        jnp.concatenate(
            [wr.reshape(B, T, _CBW)[:, 1:, 0], incl[:, -1:]], axis=1
        )
        - base
    )
    dst = (b_ar * CWp + base * upf).reshape(-1)
    src = ((b_ar * T + t_ar) * (upf * _CW)).reshape(-1)
    lens = (cnt * upf).reshape(-1)
    compact = runs_merge(
        staging.reshape(-1), dst, src, lens, B * CWp
    ).reshape(B, CWp)
    if pair == 0:
        compact = pack_u16_pairs(compact)
    return compact, nnz


def _pack_pairs_kernel(x_ref, out_ref):
    """(R, 2, 128) u32 item slabs -> (R, 128) packed u16 pairs."""
    R = out_ref.shape[0]
    l = jax.lax.broadcasted_iota(I32, (R, 128), 1)
    sel = l >> 6
    e0 = jnp.take_along_axis(x_ref[:, 0, :], (2 * l) & 127, axis=1)
    e1 = jnp.take_along_axis(x_ref[:, 1, :], (2 * l) & 127, axis=1)
    e = jnp.where(sel == 1, e1, e0)
    o0 = jnp.take_along_axis(x_ref[:, 0, :], (2 * l + 1) & 127, axis=1)
    o1 = jnp.take_along_axis(x_ref[:, 1, :], (2 * l + 1) & 127, axis=1)
    o = jnp.where(sel == 1, o1, o0)
    out_ref[...] = (e & U32(0xFFFF)) | (o << U32(16))


@jax.jit
def pack_u16_pairs(items32: jax.Array) -> jax.Array:
    """uint32[B, N] one-item-per-lane -> uint32[B, N/2] little-endian u16
    pairs (N must be a multiple of 2*_CW cells here)."""
    B, N = items32.shape
    RW = 1024  # input rows per grid cell
    T = -(-N // (RW * 128))
    x = jnp.pad(items32, ((0, 0), (0, T * RW * 128 - N))).reshape(
        B * T, RW // 2, 2, 128
    )
    out = pallas_call(
        _pack_pairs_kernel,
        grid=(B * T,),
        in_specs=[
            pl.BlockSpec(
                (None, RW // 2, 2, 128), lambda c: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, RW // 2, 128), lambda c: (c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * T, RW // 2, 128), U32),
    )(x)
    return out.reshape(B, -1)[:, : N // 2]


@functools.partial(jax.jit, static_argnames=("n_floats", "pair"))
def expand_by_bitmap(
    nz32: jax.Array,
    bitmap32: jax.Array,
    n_floats: int,
    pair: int = 1,
):
    """out[f] = (bit f of bitmap) ? nz[pair*rank(f) ...] : 0.

    nz32: uint32[B, NW] compact stream; bitmap32: uint32[B, >=ceil(n/32)]
    lsb-first bit order (see bitrev8_words). Returns
    uint32[B, pair * ceil_to_cell(n_floats)]; content beyond n_floats is
    whatever the (zero-padded) bitmap produces — zeros.
    """
    B, NW = nz32.shape
    NF = -(-n_floats // _CW) * _CW
    T = NF // _CW
    NBW = NF // 32

    bm = jnp.pad(
        bitmap32[:, : min(bitmap32.shape[1], NBW)],
        ((0, 0), (0, max(NBW - bitmap32.shape[1], 0))),
    )
    # mask bits beyond n_floats (callers may pass capacity-width bitmaps)
    if n_floats < NF:
        wpos = jnp.arange(NBW, dtype=I32)[None, :]
        rem = jnp.clip(n_floats - wpos * 32, 0, 32).astype(U32)
        wmask = jnp.where(
            rem >= 32, U32(0xFFFFFFFF), (U32(1) << rem) - U32(1)
        )
        bm = bm & wmask

    pc = popcount32(bm)
    incl = jnp.cumsum(pc, axis=1)
    wr = (incl - pc).astype(I32)  # exclusive per-word rank

    base = wr.reshape(B, T, _CBW)[:, :, 0].reshape(-1)
    endr = jnp.concatenate(
        [wr.reshape(B, T, _CBW)[:, 1:, 0], incl[:, -1:, None][:, :, 0]],
        axis=1,
    ).reshape(-1)
    cnt = endr - base
    if pair:
        span = (base * pair) % 1024 + (cnt + 1) * pair
    else:
        span = (base // 2) % 1024 + cnt // 2 + 2
    nchd = jnp.clip((span + 1023) // 1024, 1, _WINC).astype(I32)

    pad = (-NW) % 1024 + _WIN + 1024
    nz2 = jnp.pad(nz32, ((0, 0), (0, pad))).reshape(B, -1, 128)
    NZR = nz2.shape[1]
    nz2 = nz2.reshape(B * NZR, 128)

    bm_in = bm.reshape(B * T, 2, 128)
    wr_in = wr.reshape(B * T, 2, 128)

    if pair == 1:
        out_rows = _R
    elif pair == 2:
        out_rows = None  # 4-D block below
    else:
        out_rows = _R // 2
    if pair == 2:
        out_block = pl.BlockSpec(
            (None, _R, 2, 128), lambda b, t, s1, s2: (b * T + t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B * T, _R, 2, 128), U32)
    else:
        out_block = pl.BlockSpec(
            (None, out_rows, 128), lambda b, t, s1, s2: (b * T + t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B * T, out_rows, 128), U32)

    out = pallas_call(
        functools.partial(_expand_kernel, pair=pair, NZR=NZR),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, T),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (None, 2, 128), lambda b, t, s1, s2: (b * T + t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (None, 2, 128), lambda b, t, s1, s2: (b * T + t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_block,
            scratch_shapes=[
                pltpu.VMEM((_WIN // 128, 128), U32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(base.astype(I32), nchd, nz2, bm_in, wr_in)
    wpc = pair * _CW if pair else _CW // 2  # output words per cell
    return out.reshape(B, T * wpc)
