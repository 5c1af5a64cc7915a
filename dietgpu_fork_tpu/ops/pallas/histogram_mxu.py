"""Pallas MXU histogram: 256-bin byte counts as nibble-pair outer products.

The reference's histogram is shared-memory atomics (GpuANSStatistics.cuh:
21-134); TPU has no vector scatter, and a plain compare-and-reduce costs
256 VPU compare+adds per byte (~20 ms for 16 MiB on v5e). The MXU version
factors each byte into (hi, lo) nibbles and counts all 256 joint values as
a 16x16 co-occurrence matrix: build 16-wide one-hot indicators for both
nibbles of 8-byte groups in VMEM (lane l of an indicator row = byte slot
l%8, nibble value l>>3) and contract over the group axis on the MXU:

    P = A_hi^T @ A_lo          (128x128, f32 accumulation)
    hist[vh, vl] = sum_s P[vh*8+s, vl*8+s]   (the 8 same-slot diagonals)

One-hot values are exact in bfloat16 and every count fits f32 exactly
(< 2^24 per cell per 128 MiB member). Callers pass zero-padded rows; the
pad inflates bin 0 and is subtracted outside.
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
BF16 = jnp.bfloat16

_R = 1024  # rows per grid chunk (chunk = R*128 bytes = 128 KiB)


import os

_ONEHOT_CMP = os.environ.get("DIETTPU_HIST_ONEHOT") == "cmp"


def _onehot16(n, valf):
    """(R,128) bf16 indicator [n == val] for integer nibble planes.

    Arithmetic form relu(1 - |n - val|) — exact for integers (|d| >= 1
    off-match), all values exact in bf16 — so the whole chain runs at
    bf16 double rate with no i1 mask materialization / f32 select +
    cast relayouts (those cost as much as the compares on v5e).
    DIETTPU_HIST_ONEHOT=cmp restores the compare+select construction
    for A/B timing."""
    if _ONEHOT_CMP:
        return jnp.where(n == valf.astype(I32), 1.0, 0.0).astype(BF16)
    d = n.astype(BF16) - valf.astype(BF16)
    return jnp.maximum(BF16(1.0) - jnp.abs(d), BF16(0.0))


_DOT_WIDTH = 8  # byte-groups contracted per MXU dot (K = width * R)


def _hist_body(byte_of, groups: int, acc, rows: int = _R):
    """Accumulate nibble-pair outer products; byte_of(g) yields the
    (rows, 128) int32 byte matrix of group g (8 bytes per row, replicated
    x16). Indicators for _DOT_WIDTH groups are concatenated along the
    contraction (sublane) axis before each dot: measured on v5e, one
    K=8192 contraction runs ~2.5x faster per MAC than eight K=1024 ones
    (short-K MXU pipelines drain between dots), and the sublane concat of
    already-computed indicators is free."""
    lane = jax.lax.broadcasted_iota(I32, (rows, 128), 1)
    val = lane >> 3  # target nibble value per lane
    width = _DOT_WIDTH if groups % _DOT_WIDTH == 0 else 1

    def body(g, total):
        his, los = [], []
        for t in range(width):
            b = byte_of(g * width + t, lane)
            his.append(_onehot16(b >> 4, val))
            los.append(_onehot16(b & 0xF, val))
        a_hi = his[0] if width == 1 else jnp.concatenate(his, axis=0)
        a_lo = los[0] if width == 1 else jnp.concatenate(los, axis=0)
        return total + jax.lax.dot_general(
            a_hi, a_lo,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    total = jax.lax.fori_loop(
        0, groups // width, body, jnp.zeros((128, 128), jnp.float32),
        unroll=False,
    )
    acc[...] = acc[...] + total


def _hist_kernel(x_ref, out_ref, acc, *, nch: int):
    ch = pl.program_id(1)

    @pl.when(ch == 0)
    def _():
        acc[...] = jnp.zeros((128, 128), jnp.float32)

    x = x_ref[...].astype(I32)  # (R, 128); i32 lanes for the gather

    def byte_of(g, lane):
        idx = g * 8 + (lane & 7)
        return jnp.take_along_axis(x, idx, axis=1)

    _hist_body(byte_of, 16, acc)

    @pl.when(ch == nch - 1)
    def _():
        out_ref[...] = acc[...]


def _hist_kernel_packed(x_ref, out_ref, acc, *, nch: int):
    """Same, but input rows are 128 uint32 words = 512 bytes; 64 groups."""
    ch = pl.program_id(1)

    @pl.when(ch == 0)
    def _():
        acc[...] = jnp.zeros((128, 128), jnp.float32)

    x = pltpu.bitcast(x_ref[...], I32)  # (R, 128) words

    def byte_of(g, lane):
        idx = g * 2 + ((lane & 7) >> 2)
        w = jnp.take_along_axis(x, idx, axis=1)
        return (w >> ((lane & 3) * 8)) & 0xFF

    _hist_body(byte_of, 64, acc)

    @pl.when(ch == nch - 1)
    def _():
        out_ref[...] = acc[...]


@jax.jit
def histogram_mxu(data_u8: jax.Array, sizes: jax.Array) -> jax.Array:
    """data_u8: uint8[B, S] zero-padded rows; sizes: int32[B] valid bytes.
    Returns uint32[B, 256] histograms of the first sizes[b] bytes."""
    B, S = data_u8.shape
    chunk = _R * 128
    SP = -(-S // chunk) * chunk
    nch = SP // chunk
    pos = jnp.arange(S, dtype=I32)[None, :]
    data_u8 = jnp.where(pos < sizes.astype(I32)[:, None], data_u8, 0)
    x = jnp.pad(data_u8, ((0, 0), (0, SP - S))).reshape(B * nch, _R, 128)

    p = pallas_call(
        functools.partial(_hist_kernel, nch=nch),
        grid=(B, nch),
        in_specs=[
            pl.BlockSpec(
                (None, _R, 128), lambda b, c: (b * nch + c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, 128, 128), lambda b, c: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(x)

    return _extract(p, B, SP, sizes)


def _extract(p, B, padded_bytes, sizes):
    # extract the 8 same-slot diagonals: hist[vh, vl] = sum_s P[8vh+s, 8vl+s]
    p4 = p.reshape(B, 16, 8, 16, 8)
    hist = jnp.einsum("bisjs->bij", p4).reshape(B, 256)
    hist = jnp.round(hist).astype(U32)
    # the zero-padding counted into bin 0
    pad0 = (padded_bytes - sizes.astype(I32)).astype(U32)
    hist = hist.at[:, 0].add(-pad0)
    return hist


@jax.jit
def histogram_mxu_packed(data32: jax.Array, sizes: jax.Array) -> jax.Array:
    """data32: uint32[B, W] packed byte rows; sizes: int32[B] valid bytes.
    Bytes beyond sizes[b] are masked to zero before counting."""
    from ..checksum import mask_packed_bytes

    B, W = data32.shape
    chunk = _R * 128  # words per chunk (= 512 bytes per row)
    WP = -(-W // chunk) * chunk
    nch = WP // chunk
    x = jnp.pad(mask_packed_bytes(data32, sizes), ((0, 0), (0, WP - W)))
    x = x.reshape(B * nch, _R, 128)

    p = pallas_call(
        functools.partial(_hist_kernel_packed, nch=nch),
        grid=(B, nch),
        in_specs=[
            pl.BlockSpec(
                (None, _R, 128), lambda b, c: (b * nch + c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, 128, 128), lambda b, c: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(x)
    return _extract(p, B, 4 * WP, sizes)
