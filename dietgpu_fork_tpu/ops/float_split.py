"""Float word split/join bit tricks, batched in jnp.

The split isolates the high-entropy-free exponent byte(s) for ANS coding and
leaves sign+mantissa raw, using a rotate-left-by-1 so the sign bit lands in
the raw section (reference: FloatTypeInfo<FT>::split/join,
GpuFloatUtils.cuh:194-382). Pure elementwise VPU bit ops — XLA fuses the
whole split/join with adjacent producers/consumers.

fp64 is represented as (lo, hi) uint32 pairs so nothing requires 64-bit
lanes on TPU (GpuFloatUtils.cuh:342-356 builds its 64-bit rotate from two
32-bit funnel shifts for the same reason).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..core.constants import FloatType
from .bitops import rotl16, rotl32, rotr16, rotr32, u32

U8 = jnp.uint8
U16 = jnp.uint16
U32 = jnp.uint32


def split_f16(w: jax.Array) -> Tuple[List[jax.Array], List[jax.Array]]:
    w = w.astype(U16)
    return [(w >> U16(8)).astype(U8)], [w.astype(U8)]


def join_f16(comp, noncomp) -> jax.Array:
    return (comp[0].astype(U16) << U16(8)) | noncomp[0].astype(U16)


def split_bf16(w: jax.Array) -> Tuple[List[jax.Array], List[jax.Array]]:
    r = rotl16(w.astype(U16), 1)
    return [(r >> U16(8)).astype(U8)], [r.astype(U8)]


def join_bf16(comp, noncomp) -> jax.Array:
    v = (comp[0].astype(U16) << U16(8)) | noncomp[0].astype(U16)
    return rotr16(v, 1)


def split_f32(w: jax.Array) -> Tuple[List[jax.Array], List[jax.Array]]:
    r = rotl32(w.astype(U32), 1)
    comp = (r >> u32(24)).astype(U8)
    nc1 = (r & u32(0xFFFF)).astype(U16)  # low 2 raw bytes
    nc2 = ((r >> u32(16)) & u32(0xFF)).astype(U8)  # high raw byte
    return [comp], [nc1, nc2]


def join_f32(comp, noncomp) -> jax.Array:
    v = (
        (comp[0].astype(U32) << u32(24))
        | (noncomp[1].astype(U32) << u32(16))
        | noncomp[0].astype(U32)
    )
    return rotr32(v, 1)


def split_f64(lo: jax.Array, hi: jax.Array):
    """64-bit rotl(1) on (lo, hi) uint32 halves, then split into two
    exponent bytes + (u32, u16) raw sections."""
    lo = lo.astype(U32)
    hi = hi.astype(U32)
    v_hi = (hi << u32(1)) | (lo >> u32(31))
    v_lo = (lo << u32(1)) | (hi >> u32(31))
    comp0 = (v_hi >> u32(24)).astype(U8)
    comp1 = ((v_hi >> u32(16)) & u32(0xFF)).astype(U8)
    nc1 = v_lo  # low 4 raw bytes
    nc2 = (v_hi & u32(0xFFFF)).astype(U16)  # middle 2 raw bytes
    return [comp0, comp1], [nc1, nc2]


def join_f64(comp, noncomp) -> Tuple[jax.Array, jax.Array]:
    v_hi = (
        (comp[0].astype(U32) << u32(24))
        | (comp[1].astype(U32) << u32(16))
        | noncomp[1].astype(U32)
    )
    v_lo = noncomp[0].astype(U32)
    # 64-bit rotr(1)
    lo = (v_lo >> u32(1)) | (v_hi << u32(31))
    hi = (v_hi >> u32(1)) | (v_lo << u32(31))
    return lo, hi


def split_words32(data32: jax.Array, n_cap: int, float_type: FloatType):
    """Split a uint32-packed word row (B, W32) holding n_cap float words.

    Returns (comp_planes: list of uint8[B, n_cap],
             noncomp_sections: list of arrays length n_cap on axis 1).
    """
    ft = FloatType(float_type)
    if ft in (FloatType.FLOAT16, FloatType.BFLOAT16):
        # little-endian u16 lanes of each u32 word (shift-based; chained
        # bitcasts trip an XLA CPU simplifier bug)
        w16 = jnp.stack(
            [data32 & u32(0xFFFF), data32 >> u32(16)], axis=2
        ).reshape(data32.shape[0], -1).astype(U16)[:, :n_cap]
        return (split_f16 if ft == FloatType.FLOAT16 else split_bf16)(w16)
    if ft == FloatType.FLOAT32:
        return split_f32(data32[:, :n_cap])
    if ft == FloatType.FLOAT64:
        return split_f64(data32[:, 0 : 2 * n_cap : 2], data32[:, 1 : 2 * n_cap : 2])
    raise ValueError(f"unsupported float type {float_type}")


def join_words32(comp, noncomp, float_type: FloatType) -> jax.Array:
    """Inverse of split_words32; returns uint32-packed rows (B, W32)."""
    ft = FloatType(float_type)
    if ft in (FloatType.FLOAT16, FloatType.BFLOAT16):
        w16 = (join_f16 if ft == FloatType.FLOAT16 else join_bf16)(comp, noncomp)
        B, n = w16.shape
        pad = (-n) % 2
        if pad:
            w16 = jnp.pad(w16, ((0, 0), (0, pad)))
        v = w16.astype(U32).reshape(B, -1, 2)
        return v[..., 0] | (v[..., 1] << u32(16))
    if ft == FloatType.FLOAT32:
        return join_f32(comp, noncomp)
    if ft == FloatType.FLOAT64:
        lo, hi = join_f64(comp, noncomp)
        return jnp.stack([lo, hi], axis=2).reshape(lo.shape[0], -1)
    raise ValueError(f"unsupported float type {float_type}")
