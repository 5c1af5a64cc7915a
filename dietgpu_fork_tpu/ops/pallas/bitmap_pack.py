"""Pallas MSB-first nonzero-bitmap packing (the sparse codec's
generate_bitmap + bitmap_bytes_to_bits, GpuSparseFloatCompress.cuh:29-113,
fused into one pass) for every float word size.

The XLA formulation (per-float shifted bits + strided reduce_window
OR-folds) costs ~3 ms per 30 MiB on v5e; these kernels read each data word
once and emit dense bitmap rows:

  * per lane, the nonzero bit(s) of its float word(s) are pre-shifted to
    their MSB-first in-word positions (lane-only dependence);
  * a log2 masked-roll OR-fold collapses each aligned lane group
    (= 32 consecutive floats: 16 lanes for u16 pairs, 32 for fp32,
    64 for fp64 word pairs) into a bitmap word at the group's lane 0;
  * stride-N data slabs are gathered into the lane packets of one dense
    128-lane output row.

Nonzero is an integer compare (-0.0 counts as nonzero), matching
models/sparse and the reference kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import pallas_call

I32 = jnp.int32
U32 = jnp.uint32

_R = 1024  # data rows per grid cell (512 KiB of input)


def _pack16_kernel(x_ref, out_ref):
    R16 = _R // 16
    lane = jax.lax.broadcasted_iota(I32, (R16, 128), 1)
    gl = lane & 15
    f0 = (2 * lane) & 31
    sh0 = (f0 ^ 7).astype(U32)
    sh1 = ((f0 + 1) ^ 7).astype(U32)

    acc = jnp.zeros((R16, 128), U32)
    for t in range(16):
        w = x_ref[:, t, :]
        v = (((w & U32(0xFFFF)) != 0).astype(U32) << sh0) | (
            ((w >> U32(16)) != 0).astype(U32) << sh1
        )
        for k in (1, 2, 4, 8):
            sh = pltpu.roll(v, 128 - k, 1)
            v = v | jnp.where(gl < 16 - k, sh, U32(0))
        # the 8 group words (lanes 0,16,..112) -> lanes [8t, 8t+8)
        idx = jnp.clip(16 * (lane - 8 * t), 0, 127)
        g = jnp.take_along_axis(v, idx, axis=1)
        acc = acc | jnp.where(
            (lane >= 8 * t) & (lane < 8 * t + 8), g, U32(0)
        )
    out_ref[...] = acc


def _pack32_kernel(x_ref, out_ref):
    R32 = _R // 32
    lane = jax.lax.broadcasted_iota(I32, (R32, 128), 1)
    gl = lane & 31
    sh = (gl ^ 7).astype(U32)

    acc = jnp.zeros((R32, 128), U32)
    for t in range(32):
        w = x_ref[:, t, :]
        v = (w != 0).astype(U32) << sh
        for k in (1, 2, 4, 8, 16):
            s = pltpu.roll(v, 128 - k, 1)
            v = v | jnp.where(gl < 32 - k, s, U32(0))
        # the 4 group words (lanes 0,32,64,96) -> lanes [4t, 4t+4)
        idx = jnp.clip(32 * (lane - 4 * t), 0, 127)
        g = jnp.take_along_axis(v, idx, axis=1)
        acc = acc | jnp.where(
            (lane >= 4 * t) & (lane < 4 * t + 4), g, U32(0)
        )
    out_ref[...] = acc


def _pack64_kernel(x_ref, out_ref):
    R64 = _R // 64
    lane = jax.lax.broadcasted_iota(I32, (R64, 128), 1)
    gl = lane & 63
    # float f = lane>>1 within the 64-lane group; both halves of the u64
    # carry the same target bit, so the k=1 fold ORs the word pair
    sh = (((gl >> 1) & 31) ^ 7).astype(U32)

    acc = jnp.zeros((R64, 128), U32)
    for t in range(64):
        w = x_ref[:, t, :]
        v = (w != 0).astype(U32) << sh
        for k in (1, 2, 4, 8, 16, 32):
            s = pltpu.roll(v, 128 - k, 1)
            v = v | jnp.where(gl < 64 - k, s, U32(0))
        # the 2 group words (lanes 0,64) -> lanes [2t, 2t+2)
        idx = jnp.clip(64 * (lane - 2 * t), 0, 127)
        g = jnp.take_along_axis(v, idx, axis=1)
        acc = acc | jnp.where(
            (lane >= 2 * t) & (lane < 2 * t + 2), g, U32(0)
        )
    out_ref[...] = acc


@jax.jit
def pack_bitmap16_tpu(data32: jax.Array) -> jax.Array:
    """data32: uint32[B, W] of packed u16 float pairs. Returns
    uint32[B, ceil(W/16)] MSB-first bitmap words (bit f set iff float f
    nonzero). Padding words are zero so only the caller's in-word tail
    bits need masking."""
    B, W = data32.shape
    chunk = _R * 128
    WP = -(-W // chunk) * chunk
    nch = WP // chunk
    x = jnp.pad(data32, ((0, 0), (0, WP - W))).reshape(
        B * nch, _R // 16, 16, 128
    )
    out = pallas_call(
        _pack16_kernel,
        grid=(B * nch,),
        in_specs=[
            pl.BlockSpec(
                (None, _R // 16, 16, 128), lambda c: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, _R // 16, 128), lambda c: (c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * nch, _R // 16, 128), U32),
    )(x)
    return out.reshape(B, -1)[:, : -(-W // 16)]


@jax.jit
def pack_bitmap32_tpu(data32: jax.Array) -> jax.Array:
    """data32: uint32[B, W] of fp32 words. Returns uint32[B, ceil(W/32)]
    MSB-first bitmap words (bit f set iff word f nonzero)."""
    B, W = data32.shape
    chunk = _R * 128
    WP = -(-W // chunk) * chunk
    nch = WP // chunk
    x = jnp.pad(data32, ((0, 0), (0, WP - W))).reshape(
        B * nch, _R // 32, 32, 128
    )
    out = pallas_call(
        _pack32_kernel,
        grid=(B * nch,),
        in_specs=[
            pl.BlockSpec(
                (None, _R // 32, 32, 128), lambda c: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, _R // 32, 128), lambda c: (c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * nch, _R // 32, 128), U32),
    )(x)
    return out.reshape(B, -1)[:, : -(-W // 32)]


@jax.jit
def pack_bitmap64_tpu(data32: jax.Array) -> jax.Array:
    """data32: uint32[B, W] of fp64 word pairs (float f = words 2f, 2f+1).
    Returns uint32[B, ceil(W/64)] MSB-first bitmap words (bit f set iff
    either half of float f is nonzero)."""
    B, W = data32.shape
    chunk = _R * 128
    WP = -(-W // chunk) * chunk
    nch = WP // chunk
    x = jnp.pad(data32, ((0, 0), (0, WP - W))).reshape(
        B * nch, _R // 64, 64, 128
    )
    out = pallas_call(
        _pack64_kernel,
        grid=(B * nch,),
        in_specs=[
            pl.BlockSpec(
                (None, _R // 64, 64, 128), lambda c: (c, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, _R // 64, 128), lambda c: (c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * nch, _R // 64, 128), U32),
    )(x)
    return out.reshape(B, -1)[:, : -(-W // 64)]
