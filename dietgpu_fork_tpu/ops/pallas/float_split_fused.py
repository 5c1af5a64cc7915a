"""Pallas float split/join: packed-plane (de)interleave at HBM speed.

The float codec's split is elementwise bit math plus a 2:1 or 4:1 lane
(de)interleave; XLA lowers the strided slices to a serial gather on TPU
(~70 ms for 32 MiB), so these kernels do the interleave with static
lane-gathers inside VMEM instead (~2 vector ops per output word).

Key layout move: a (rows, 128) tile viewed as (rows/2, 2, 128) or
(rows/4, 4, 128) is a FREE reshape, and Mosaic slices the middle "slab"
dimension of values and refs natively — so "input words 2i, 2i+1" becomes
"slab = bit 6 of the lane, lane (2i) mod 128": one static take_along_axis
per slab plus selects.

Same contracts as ops.float_split.split_packed / join_packed
(reference bit tricks: FloatTypeInfo<FT>::split/join,
GpuFloatUtils.cuh:194-382).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import pallas_call

from ...core.constants import FloatType
from .histogram_mxu import _onehot16

I32 = jnp.int32
U32 = jnp.uint32
_B0 = 0xFF  # plain int: a jnp scalar here would be a captured constant

_ROWS = 1024  # input words rows per grid cell (512 KiB)


def _lane(shape):
    return jax.lax.broadcasted_iota(I32, shape, len(shape) - 1)


_HW = 16  # byte-groups concatenated per MXU dot (K = _HW * R)


def _hist_accum(plane, acc, first, base_byte, nbytes):
    """Accumulate the 16x16 nibble-pair histogram of a packed uint32 plane
    value (R, 128) into a (128, 128) f32 scratch (same construction as
    ops.pallas.histogram_mxu; the split's exponent read is free here, which
    is exactly the reference's fused splitFloat+histogram,
    GpuFloatCompress.cuh:423-551). Bytes at global positions >= nbytes are
    redirected to bin 0 and subtracted by the host wrapper; cells entirely
    inside the member (the common case) skip the mask chain via a scalar
    branch."""
    R = plane.shape[0]
    lane = _lane((R, 128))
    val = lane >> 3
    idx0 = (lane & 7) >> 2
    sh = ((lane & 3) * 8).astype(jnp.uint32)

    @pl.when(first)
    def _():
        acc[...] = jnp.zeros((128, 128), jnp.float32)

    def make_body(masked):
        # global byte position of lane's byte at g=0 (advances by 8 per g)
        row = jax.lax.broadcasted_iota(I32, (R, 128), 0)
        pos0 = base_byte + row * 512 + idx0 * 4 + (lane & 3)

        def body(g, total):
            his, los = [], []
            for t in range(_HW):
                gg = g * _HW + t
                w = jnp.take_along_axis(plane, idx0 + 2 * gg, axis=1)
                b = ((w >> sh) & jnp.uint32(0xFF)).astype(I32)
                if masked:
                    b = jnp.where(pos0 + 8 * gg < nbytes, b, 0)
                his.append(_onehot16(b >> 4, val))
                los.append(_onehot16(b & 0xF, val))
            a_hi = jnp.concatenate(his, axis=0)
            a_lo = jnp.concatenate(los, axis=0)
            return total + jax.lax.dot_general(
                a_hi, a_lo,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        return body

    zero = jnp.zeros((128, 128), jnp.float32)
    total = jax.lax.cond(
        base_byte + R * 512 <= nbytes,
        # Mosaic only lowers unroll=1 or unroll=num_steps; full unroll
        # (4 steps at _HW=16) exceeds the 16 MiB scoped-VMEM stack limit.
        lambda: jax.lax.fori_loop(
            0, 64 // _HW, make_body(False), zero, unroll=1
        ),
        lambda: jax.lax.fori_loop(
            0, 64 // _HW, make_body(True), zero, unroll=1
        ),
    )
    acc[...] = acc[...] + total


def _xor_accum(x_ref, accx, first, base_word, nbytes):
    """XOR-accumulate the cell's (masked) input words into a FULL-WIDTH
    (R, 128) u32 scratch — the compress-side checksum fused into the split
    pass, as the reference fuses checksumBatch into splitFloat
    (GpuFloatCompress.cuh:702-710). One vector XOR per cell; the member's
    last cell collapses the accumulator via _fold_xor_acc (the per-cell
    tree fold this replaces cost ~0.35 ms per 16Mi member). The per-byte
    tail mask is only computed for the cell containing the member's last
    byte; the host wrapper folds (8, 128) accumulators to byte checksums."""
    x = x_ref[...]
    sh = x.shape
    R = sh[0] * sh[1]
    x = x.reshape(R, 128)

    @pl.when(first)
    def _():
        accx[...] = jnp.zeros((R, 128), U32)

    cell_words = R * 128

    def masked():
        row = jax.lax.broadcasted_iota(I32, (R, 128), 0)
        widx = base_word + row * 128 + _lane((R, 128))
        c = jnp.clip(nbytes - 4 * widx, 0, 4).astype(U32)
        mb = jnp.where(
            c >= 4, U32(0xFFFFFFFF), (U32(1) << (U32(8) * c)) - U32(1)
        )
        return x & mb

    xm = jax.lax.cond(
        base_word + cell_words > (nbytes + 3) // 4, masked, lambda: x
    )
    accx[...] = accx[...] ^ xm


def _mask_tail_words(val, base_word, nbytes):
    """Zero bytes of a packed-u32 section value at global byte positions
    >= nbytes (the split's fused raw-section tail mask; replaces the driver
    side mask_packed_bytes pass). base_word = global u32 index of
    val[0, ..., 0]; only the member's boundary cell pays the mask chain."""
    sh = val.shape
    R = 1
    for d in sh[:-1]:
        R *= d
    v = val.reshape(R, 128)
    cell_words = R * 128

    def masked():
        row = jax.lax.broadcasted_iota(I32, (R, 128), 0)
        widx = base_word + row * 128 + _lane((R, 128))
        c = jnp.clip(nbytes - 4 * widx, 0, 4).astype(U32)
        mb = jnp.where(
            c >= 4, U32(0xFFFFFFFF), (U32(1) << (U32(8) * c)) - U32(1)
        )
        return v & mb

    out = jax.lax.cond(
        base_word + cell_words > (nbytes + 3) // 4, masked, lambda: v
    )
    return out.reshape(sh)


def _fold_xor_acc(accx):
    """Tree-fold the (R, 128) xor accumulator to the (8, 128) output;
    adaptive cell rows need not be a power of two."""
    xm = accx[...]
    npow = 8
    while npow < xm.shape[0]:
        npow *= 2
    if npow != xm.shape[0]:
        xm = jnp.pad(xm, ((0, npow - xm.shape[0]), (0, 0)))
    while xm.shape[0] > 8:
        h = xm.shape[0] // 2
        xm = xm[:h] ^ xm[h:]
    return xm


def _gsel(slabs, flat_lane_idx, sel):
    """value[r, l] = slabs[sel[r,l]][r, flat_lane_idx[r,l] & 127]."""
    idx = flat_lane_idx & 127
    out = jnp.take_along_axis(slabs[0], idx, axis=1)
    for p in range(1, len(slabs)):
        g = jnp.take_along_axis(slabs[p], idx, axis=1)
        out = jnp.where(sel == p, g, out)
    return out


def _rotl16x2(x):
    return ((x << U32(1)) & U32(0xFFFEFFFE)) | ((x >> U32(15)) & U32(0x00010001))


def _rotr16x2(x):
    return ((x >> U32(1)) & U32(0x7FFF7FFF)) | ((x << U32(15)) & U32(0x80008000))


def _pack4(b0, b1, b2, b3):
    return b0 | (b1 << U32(8)) | (b2 << U32(16)) | (b3 << U32(24))


def _b(x, k):
    return (x >> U32(8 * k)) & _B0


def _bv(x, k):
    """byte k (vector of lane-varying k) of each uint32."""
    return (x >> (U32(8) * k.astype(U32))) & _B0


def _deint2(x0, x1, shape):
    """(even, odd) word streams of the pair-slab view."""
    l = _lane(shape)
    sel = l >> 6
    we = _gsel([x0, x1], 2 * l, sel)
    wo = _gsel([x0, x1], 2 * l + 1, sel)
    return we, wo


def _deint4(ws, shape):
    l = _lane(shape)
    sel = l >> 5
    return [_gsel(ws, 4 * l + k, sel) for k in range(4)]


# ---------------------------------------------------------------------------
# split kernels
# ---------------------------------------------------------------------------


def _split16_kernel(x_ref, exp_ref, raw_ref, *, rotate: bool):
    R2 = exp_ref.shape[0]
    x0 = x_ref[:, 0, :]
    x1 = x_ref[:, 1, :]
    if rotate:
        x0 = _rotl16x2(x0)
        x1 = _rotl16x2(x1)
    we, wo = _deint2(x0, x1, (R2, 128))
    exp_ref[...] = _pack4(
        (we >> U32(8)) & _B0, we >> U32(24),
        (wo >> U32(8)) & _B0, wo >> U32(24),
    )
    raw_ref[...] = _pack4(
        we & _B0, (we >> U32(16)) & _B0,
        wo & _B0, (wo >> U32(16)) & _B0,
    )


def _finish_hist(plane_ref, n_ref, hist_ref, acc):
    """Per-cell histogram accumulation for one exponent plane output."""
    t = pl.program_id(1)
    R = plane_ref.shape[0]
    _hist_accum(
        plane_ref[...], acc, t == 0, t * R * 512, n_ref[pl.program_id(0)]
    )

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        hist_ref[...] = acc[...]


def _split16_hist_kernel(n_ref, x_ref, exp_ref, raw_ref, hist_ref, cs_ref,
                         acc, accx, *, rotate: bool, ws: int):
    _split16_kernel(x_ref, exp_ref, raw_ref, rotate=rotate)
    t = pl.program_id(1)
    n = n_ref[pl.program_id(0)]
    R2 = raw_ref.shape[0]
    raw_ref[...] = _mask_tail_words(raw_ref[...], t * R2 * 128, n)
    _finish_hist(exp_ref, n_ref, hist_ref, acc)
    _finish_csum(x_ref, n_ref, cs_ref, accx, ws)


def _finish_csum(x_ref, n_ref, cs_ref, accx, ws):
    t = pl.program_id(1)
    cell_words = 1
    for d in x_ref.shape:
        cell_words *= d
    _xor_accum(
        x_ref, accx, t == 0, t * cell_words,
        n_ref[pl.program_id(0)] * ws,
    )

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        cs_ref[...] = _fold_xor_acc(accx)


def _split32_hist_kernel(n_ref, x_ref, exp_ref, sec1_ref, sec2_ref,
                         hist_ref, cs_ref, acc, accx):
    _split32_kernel(x_ref, exp_ref, sec1_ref, sec2_ref)
    t = pl.program_id(1)
    n = n_ref[pl.program_id(0)]
    R4 = sec2_ref.shape[0]
    sec1_ref[...] = _mask_tail_words(
        sec1_ref[...], t * R4 * 2 * 128, 2 * n
    )
    sec2_ref[...] = _mask_tail_words(sec2_ref[...], t * R4 * 128, n)
    _finish_hist(exp_ref, n_ref, hist_ref, acc)
    _finish_csum(x_ref, n_ref, cs_ref, accx, 4)


def _split64_hist_kernel(n_ref, x_ref, exp0_ref, exp1_ref, sec1_ref,
                         sec2_ref, hist0_ref, hist1_ref, cs_ref,
                         acc0, acc1, accx):
    _split64_kernel(x_ref, exp0_ref, exp1_ref, sec1_ref, sec2_ref)
    nn = n_ref[pl.program_id(0)]
    tt = pl.program_id(1)
    R2m = sec1_ref.shape[0]
    R4m = sec2_ref.shape[0]
    sec1_ref[...] = _mask_tail_words(sec1_ref[...], tt * R2m * 128, 4 * nn)
    sec2_ref[...] = _mask_tail_words(sec2_ref[...], tt * R4m * 128, 2 * nn)
    t = pl.program_id(1)
    R = exp0_ref.shape[0]
    n = n_ref[pl.program_id(0)]
    _hist_accum(exp0_ref[...], acc0, t == 0, t * R * 512, n)
    _hist_accum(exp1_ref[...], acc1, t == 0, t * R * 512, n)
    _xor_accum(x_ref, accx, t == 0, t * R * 8 * 128, n * 8)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        hist0_ref[...] = acc0[...]
        hist1_ref[...] = acc1[...]
        cs_ref[...] = _fold_xor_acc(accx)


def _split32_kernel(x_ref, exp_ref, sec1_ref, sec2_ref):
    R4 = exp_ref.shape[0]
    w = [
        (x_ref[:, p, :] << U32(1)) | (x_ref[:, p, :] >> U32(31))
        for p in range(4)
    ]
    w0, w1, w2, w3 = _deint4(w, (R4, 128))
    exp_ref[...] = _pack4(
        w0 >> U32(24), w1 >> U32(24), w2 >> U32(24), w3 >> U32(24)
    )
    sec2_ref[...] = _pack4(
        (w0 >> U32(16)) & _B0, (w1 >> U32(16)) & _B0,
        (w2 >> U32(16)) & _B0, (w3 >> U32(16)) & _B0,
    )
    # sec1: low 16 bits of word pairs (2j, 2j+1); two output slabs
    for half in range(2):
        a, bb = _deint2(w[2 * half], w[2 * half + 1], (R4, 128))
        sec1_ref[:, half, :] = (a & U32(0xFFFF)) | (bb << U32(16))


def _split64_kernel(x_ref, exp0_ref, exp1_ref, sec1_ref, sec2_ref):
    RF = sec1_ref.shape[0]  # float rows (128 floats each)
    lo, hi = _deint2(x_ref[:, 0, :], x_ref[:, 1, :], (RF, 128))
    v_hi = (hi << U32(1)) | (lo >> U32(31))
    v_lo = (lo << U32(1)) | (hi >> U32(31))
    sec1_ref[...] = v_lo

    vh4 = v_hi.reshape(RF // 4, 4, 128)
    h0, h1, h2, h3 = _deint4(
        [vh4[:, p, :] for p in range(4)], (RF // 4, 128)
    )
    exp0_ref[...] = _pack4(
        h0 >> U32(24), h1 >> U32(24), h2 >> U32(24), h3 >> U32(24)
    )
    exp1_ref[...] = _pack4(
        (h0 >> U32(16)) & _B0, (h1 >> U32(16)) & _B0,
        (h2 >> U32(16)) & _B0, (h3 >> U32(16)) & _B0,
    )
    vh2 = v_hi.reshape(RF // 2, 2, 128)
    a, bb = _deint2(vh2[:, 0, :], vh2[:, 1, :], (RF // 2, 128))
    sec2_ref[...] = (a & U32(0xFFFF)) | (bb << U32(16))


# ---------------------------------------------------------------------------
# join kernels
# ---------------------------------------------------------------------------


def _join16_kernel(exp_ref, raw_ref, out_ref, *, rotate: bool):
    R2 = exp_ref.shape[0]
    exp = exp_ref[...]
    raw = raw_ref[...]
    l = _lane((R2, 128))
    for p in range(2):
        src = 64 * p + (l >> 1)
        e = jnp.take_along_axis(exp, src, axis=1)
        r = jnp.take_along_axis(raw, src, axis=1)
        k = 2 * (l & 1)
        e0 = _bv(e, k)
        e1 = _bv(e, k + 1)
        r0 = _bv(r, k)
        r1 = _bv(r, k + 1)
        w = r0 | (e0 << U32(8)) | (r1 << U32(16)) | (e1 << U32(24))
        out_ref[:, p, :] = w if not rotate else _rotr16x2(w)


def _join32_kernel(exp_ref, sec1_ref, sec2_ref, out_ref):
    R4 = exp_ref.shape[0]
    exp = exp_ref[...]
    sec2 = sec2_ref[...]
    l = _lane((R4, 128))
    for p in range(4):
        j_lane = 32 * p + (l >> 2)
        k = l & 3
        eb = _bv(jnp.take_along_axis(exp, j_lane, axis=1), k)
        tb = _bv(jnp.take_along_axis(sec2, j_lane, axis=1), k)
        s1_lane = 64 * (p & 1) + (l >> 1)
        s1 = jnp.take_along_axis(sec1_ref[:, p >> 1, :], s1_lane, axis=1)
        low = jnp.where((l & 1) == 1, s1 >> U32(16), s1 & U32(0xFFFF))
        r = low | (tb << U32(16)) | (eb << U32(24))
        out_ref[:, p, :] = (r >> U32(1)) | (r << U32(31))


def _join64_kernel(exp0_ref, exp1_ref, sec1_ref, sec2_ref, out_ref):
    RF4 = exp0_ref.shape[0]  # groups of 4 float rows
    e0 = exp0_ref[...]
    e1 = exp1_ref[...]
    l = _lane((RF4, 128))
    for q in range(4):  # float row rf = 4*r4 + q
        e_lane = 32 * q + (l >> 2)
        k = l & 3
        eb0 = _bv(jnp.take_along_axis(e0, e_lane, axis=1), k)
        eb1 = _bv(jnp.take_along_axis(e1, e_lane, axis=1), k)
        # sec2 word (f>>1): slab q>>1 of the (RF4, 2, 128) pair view,
        # lane 64*(q&1) + (l>>1), half l&1
        s2 = jnp.take_along_axis(
            sec2_ref[:, q >> 1, :], 64 * (q & 1) + (l >> 1), axis=1
        )
        mid = jnp.where((l & 1) == 1, s2 >> U32(16), s2 & U32(0xFFFF))
        v_hi = mid | (eb1 << U32(16)) | (eb0 << U32(24))
        v_lo = sec1_ref[:, q, :]
        lo = (v_lo >> U32(1)) | (v_hi << U32(31))
        hi = (v_hi >> U32(1)) | (v_lo << U32(31))
        # out rows 2rf + t (t = lane>=64): word lanes interleave (lo, hi)
        m = l >> 1
        for t in range(2):
            idx = 64 * t + m
            ol = jnp.take_along_axis(lo, idx, axis=1)
            oh = jnp.take_along_axis(hi, idx, axis=1)
            out_ref[:, 2 * q + t, :] = jnp.where((l & 1) == 1, oh, ol)


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------


def _pick_rows(W):
    """Cell rows: full 1024-row (512 KiB) cells for large members, shrunk
    (multiple of 8 rows) to the member size so small batch members don't
    pay for cell padding — the reference's bs=128 x 512Ki protocol would
    otherwise split half-empty cells."""
    need = -(-W // 128)
    return min(_ROWS, max(8, -(-need // 8) * 8))


def _cells(x, rows):
    """(B, W) -> padded (B*T, rows, 128) cell view plus (B, T, Wp)."""
    B, W = x.shape
    chunk = rows * 128
    Wp = -(-W // chunk) * chunk
    xp = jnp.pad(x, ((0, 0), (0, Wp - W)))
    return xp.reshape(B * (Wp // chunk), rows // 2, 2, 128), B, Wp // chunk, Wp


def _vmem(*shape_dtypes):
    return [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in shape_dtypes
    ]


@functools.partial(jax.jit, static_argnames=("float_type",))
def split_packed_tpu(data32, float_type: FloatType):
    ft = FloatType(float_type)
    rows = _pick_rows(data32.shape[1])
    x, B, T, Wp = _cells(data32, rows)
    C = B * T
    R2 = rows // 2
    R4 = rows // 4
    R8 = rows // 8

    spec_in = pl.BlockSpec(
        (None, R2, 2, 128), lambda c: (c, 0, 0, 0), memory_space=pltpu.VMEM
    )

    def out2(r):
        return pl.BlockSpec(
            (None, r, 128), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
        )

    def out3(r, s):
        return pl.BlockSpec(
            (None, r, s, 128), lambda c: (c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    if ft in (FloatType.FLOAT16, FloatType.BFLOAT16):
        exp, raw = pallas_call(
            functools.partial(
                _split16_kernel, rotate=ft == FloatType.BFLOAT16
            ),
            grid=(C,),
            in_specs=[spec_in],
            out_specs=[out2(R2), out2(R2)],
            out_shape=[
                jax.ShapeDtypeStruct((C, R2, 128), U32),
                jax.ShapeDtypeStruct((C, R2, 128), U32),
            ],
        )(x)
        W2 = data32.shape[1] // 2
        return (
            [exp.reshape(B, -1)[:, :W2]],
            [raw.reshape(B, -1)[:, :W2]],
        )
    if ft == FloatType.FLOAT32:
        x4 = x.reshape(C, R4, 4, 128)
        exp, sec1, sec2 = pallas_call(
            _split32_kernel,
            grid=(C,),
            in_specs=[out3(R4, 4)],
            out_specs=[out2(R4), out3(R4, 2), out2(R4)],
            out_shape=[
                jax.ShapeDtypeStruct((C, R4, 128), U32),
                jax.ShapeDtypeStruct((C, R4, 2, 128), U32),
                jax.ShapeDtypeStruct((C, R4, 128), U32),
            ],
        )(x4)
        W = data32.shape[1]
        return (
            [exp.reshape(B, -1)[:, : W // 4]],
            [sec1.reshape(B, -1)[:, : W // 2],
             sec2.reshape(B, -1)[:, : W // 4]],
        )
    if ft == FloatType.FLOAT64:
        exp0, exp1, sec1, sec2 = pallas_call(
            _split64_kernel,
            grid=(C,),
            in_specs=[spec_in],
            out_specs=[out2(R8), out2(R8), out2(R2), out2(R4)],
            out_shape=[
                jax.ShapeDtypeStruct((C, R8, 128), U32),
                jax.ShapeDtypeStruct((C, R8, 128), U32),
                jax.ShapeDtypeStruct((C, R2, 128), U32),
                jax.ShapeDtypeStruct((C, R4, 128), U32),
            ],
        )(x)
        W = data32.shape[1]
        return (
            [exp0.reshape(B, -1)[:, : W // 8],
             exp1.reshape(B, -1)[:, : W // 8]],
            [sec1.reshape(B, -1)[:, : W // 2],
             sec2.reshape(B, -1)[:, : W // 4]],
        )
    raise ValueError(ft)


def _fold_csum(cs):
    """(B, 8, 128) xor partials -> uint32[B] byte checksums."""
    w = jax.lax.reduce(
        cs.reshape(cs.shape[0], -1), U32(0), jax.lax.bitwise_xor, (1,)
    )
    w = w ^ (w >> U32(16))
    return (w ^ (w >> U32(8))) & U32(0xFF)


def split_archive_geometry(B: int, W32: int, float_type: FloatType):
    """Per-raw-section (member_stride_words, cap_words) of the cells2d
    refs split_hist_packed_tpu(archive=True) returns; member b's section
    bytes start at ref word b * stride."""
    ft = FloatType(float_type)
    if W32 % {1: 2, 2: 2, 3: 4, 4: 8}[int(ft)]:
        raise ValueError("W32 must match the split's row padding")
    rows = _pick_rows(W32)
    chunk = rows * 128
    T = -(-W32 // chunk)
    if ft in (FloatType.FLOAT16, FloatType.BFLOAT16):
        per_cell = (rows // 2,)
    elif ft == FloatType.FLOAT32:
        per_cell = (2 * (rows // 4), rows // 4)
    else:
        per_cell = (rows // 2, rows // 4)
    return [
        (T * r * 128, B * T * r * 128) for r in per_cell
    ]


@functools.partial(jax.jit, static_argnames=("float_type", "archive"))
def split_hist_packed_tpu(data32, n_floats, float_type: FloatType,
                          archive: bool = False):
    """Fused split + per-plane exponent histograms + input checksum (the
    reference's splitFloat+histogram+checksum fusion). Returns
    (comp_planes, raw_sections, hists, csum) with hists uint32[B, 256]
    masked to n_floats bytes per plane and csum uint32[B] byte XOR. Raw
    sections are tail-masked to the member's bytes IN the kernel.

    archive=True returns each raw section as a MERGE REF tuple
    (cells2d uint32[rows, 128], member_stride_words, cap_words) instead of
    a sliced (B, W) array: member b's section bytes start at word
    b * stride, and the buffer carries >= 80 rows of DMA slack so
    runs_merge_multi addresses it with zero copies."""
    from .histogram_mxu import _extract

    ft = FloatType(float_type)
    rows = _pick_rows(data32.shape[1])
    x, B, T, Wp = _cells(data32, rows)
    C = B * T

    def sec_ref(cells, rows_per_cell):
        # geometry (stride/cap) is recomputed OUTSIDE the jit by
        # split_archive_geometry — only the array crosses the jit boundary
        return cells.reshape(-1, 128)

    def slack(rows_per_cell):
        return -(-80 // rows_per_cell) if archive else 0
    R2 = rows // 2
    R4 = rows // 4
    R8 = rows // 8
    n32 = n_floats.astype(I32)
    cs_spec = pl.BlockSpec(
        (None, 8, 128), lambda b, t, n_: (b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cs_shape = jax.ShapeDtypeStruct((B, 8, 128), U32)

    def out2(r):
        return pl.BlockSpec(
            (None, r, 128), lambda b, t, n_: (b * T + t, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def out3(r, s):
        return pl.BlockSpec(
            (None, r, s, 128), lambda b, t, n_: (b * T + t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    hist_spec = pl.BlockSpec(
        (None, 128, 128), lambda b, t, n_: (b, 0, 0),
        memory_space=pltpu.VMEM,
    )
    hist_shape = jax.ShapeDtypeStruct((B, 128, 128), jnp.float32)
    spec_in = pl.BlockSpec(
        (None, R2, 2, 128), lambda b, t, n_: (b * T + t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    W = data32.shape[1]

    if ft in (FloatType.FLOAT16, FloatType.BFLOAT16):
        plane_bytes = T * R2 * 512
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, T),
            in_specs=[spec_in],
            out_specs=[out2(R2), out2(R2), hist_spec, cs_spec],
            scratch_shapes=[
                pltpu.VMEM((128, 128), jnp.float32),
                pltpu.VMEM((rows, 128), U32),
            ],
        )
        exp, raw, p, cs = pallas_call(
            functools.partial(
                _split16_hist_kernel, rotate=ft == FloatType.BFLOAT16, ws=2
            ),
            grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((C, R2, 128), U32),
                jax.ShapeDtypeStruct((C + slack(R2), R2, 128), U32),
                hist_shape, cs_shape,
            ],
        )(n32, x)
        hist = _extract(p, B, plane_bytes, n32)
        W2 = W // 2
        raw_out = (
            [sec_ref(raw, R2)] if archive
            else [raw.reshape(B, -1)[:, :W2]]
        )
        return (
            [exp.reshape(B, -1)[:, :W2]],
            raw_out,
            [hist],
            _fold_csum(cs),
        )
    if ft == FloatType.FLOAT32:
        plane_bytes = T * R4 * 512
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, T),
            in_specs=[out3(R4, 4)],
            out_specs=[out2(R4), out3(R4, 2), out2(R4), hist_spec, cs_spec],
            scratch_shapes=[
                pltpu.VMEM((128, 128), jnp.float32),
                pltpu.VMEM((rows, 128), U32),
            ],
        )
        exp, sec1, sec2, p, cs = pallas_call(
            _split32_hist_kernel,
            grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((C, R4, 128), U32),
                jax.ShapeDtypeStruct((C + slack(2 * R4), R4, 2, 128), U32),
                jax.ShapeDtypeStruct((C + slack(R4), R4, 128), U32),
                hist_shape, cs_shape,
            ],
        )(n32, x.reshape(C, R4, 4, 128))
        hist = _extract(p, B, plane_bytes, n32)
        raw_out = (
            [sec_ref(sec1, 2 * R4), sec_ref(sec2, R4)] if archive
            else [sec1.reshape(B, -1)[:, : W // 2],
                  sec2.reshape(B, -1)[:, : W // 4]]
        )
        return (
            [exp.reshape(B, -1)[:, : W // 4]],
            raw_out,
            [hist],
            _fold_csum(cs),
        )
    if ft == FloatType.FLOAT64:
        plane_bytes = T * R8 * 512
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, T),
            in_specs=[spec_in],
            out_specs=[
                out2(R8), out2(R8), out2(R2), out2(R4),
                hist_spec, hist_spec, cs_spec,
            ],
            scratch_shapes=[
                pltpu.VMEM((128, 128), jnp.float32),
                pltpu.VMEM((128, 128), jnp.float32),
                pltpu.VMEM((rows, 128), U32),
            ],
        )
        exp0, exp1, sec1, sec2, p0, p1, cs = pallas_call(
            _split64_hist_kernel,
            grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((C, R8, 128), U32),
                jax.ShapeDtypeStruct((C, R8, 128), U32),
                jax.ShapeDtypeStruct((C + slack(R2), R2, 128), U32),
                jax.ShapeDtypeStruct((C + slack(R4), R4, 128), U32),
                hist_shape, hist_shape, cs_shape,
            ],
        )(n32, x)
        h0 = _extract(p0, B, plane_bytes, n32)
        h1 = _extract(p1, B, plane_bytes, n32)
        raw_out = (
            [sec_ref(sec1, R2), sec_ref(sec2, R4)] if archive
            else [sec1.reshape(B, -1)[:, : W // 2],
                  sec2.reshape(B, -1)[:, : W // 4]]
        )
        return (
            [exp0.reshape(B, -1)[:, : W // 8],
             exp1.reshape(B, -1)[:, : W // 8]],
            raw_out,
            [h0, h1],
            _fold_csum(cs),
        )
    raise ValueError(ft)


def _pad_cells2(p, B, rows):
    """(B, W) plane -> (B*T, rows, 128) padded cells (T from W)."""
    W = p.shape[1]
    chunk = rows * 128
    Wp = -(-W // chunk) * chunk
    return (
        jnp.pad(p, ((0, 0), (0, Wp - W))).reshape(-1, rows, 128),
        Wp // chunk,
    )


@functools.partial(jax.jit, static_argnames=("float_type",))
def join_packed_tpu(comp, raw, float_type: FloatType):
    ft = FloatType(float_type)
    B = comp[0].shape[0]
    # plane words per cell = rows*128/f (f = output words per plane word),
    # so cells shrink with the member exactly like the split side
    rows = _pick_rows(comp[0].shape[1] * {1: 2, 2: 2, 3: 4, 4: 8}[int(ft)])
    R2 = rows // 2
    R4 = rows // 4
    R8 = rows // 8

    def in2(r):
        return pl.BlockSpec(
            (None, r, 128), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
        )

    def in3(r, s):
        return pl.BlockSpec(
            (None, r, s, 128), lambda c: (c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    if ft in (FloatType.FLOAT16, FloatType.BFLOAT16):
        E = comp[0].shape[1]
        ec, T = _pad_cells2(comp[0], B, R2)
        rc, _ = _pad_cells2(raw[0], B, R2)
        out = pallas_call(
            functools.partial(
                _join16_kernel, rotate=ft == FloatType.BFLOAT16
            ),
            grid=(B * T,),
            in_specs=[in2(R2), in2(R2)],
            out_specs=in3(R2, 2),
            out_shape=jax.ShapeDtypeStruct((B * T, R2, 2, 128), U32),
        )(ec, rc)
        return out.reshape(B, -1)[:, : 2 * E]
    if ft == FloatType.FLOAT32:
        E = comp[0].shape[1]
        ec, T = _pad_cells2(comp[0], B, R4)
        s1c, _ = _pad_cells2(raw[0], B, R2)
        s2c, _ = _pad_cells2(raw[1], B, R4)
        out = pallas_call(
            _join32_kernel,
            grid=(B * T,),
            in_specs=[in2(R4), in3(R4, 2), in2(R4)],
            out_specs=in3(R4, 4),
            out_shape=jax.ShapeDtypeStruct((B * T, R4, 4, 128), U32),
        )(ec, s1c.reshape(-1, R4, 2, 128), s2c)
        return out.reshape(B, -1)[:, : 4 * E]
    if ft == FloatType.FLOAT64:
        E = comp[0].shape[1]
        e0c, T = _pad_cells2(comp[0], B, R8)
        e1c, _ = _pad_cells2(comp[1], B, R8)
        s1c, _ = _pad_cells2(raw[0], B, R2)
        s2c, _ = _pad_cells2(raw[1], B, R4)
        out = pallas_call(
            _join64_kernel,
            grid=(B * T,),
            in_specs=[in2(R8), in2(R8), in3(R8, 4), in3(R8, 2)],
            out_specs=in3(R8, 8),
            out_shape=jax.ShapeDtypeStruct((B * T, R8, 8, 128), U32),
        )(e0c, e1c, s1c.reshape(-1, R8, 4, 128), s2c.reshape(-1, R8, 2, 128))
        return out.reshape(B, -1)[:, : 8 * E]
    raise ValueError(ft)
