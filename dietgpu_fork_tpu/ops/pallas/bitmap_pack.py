"""Pallas MSB-first nonzero-bitmap packing for 16-bit float words (the
sparse codec's generate_bitmap + bitmap_bytes_to_bits,
GpuSparseFloatCompress.cuh:29-113, fused into one pass).

The XLA formulation (per-float shifted bits + strided reduce_window
OR-folds) costs ~3 ms per 30 MiB on v5e; this kernel reads each data word
once and emits dense bitmap rows:

  * per lane, the nonzero bits of its two u16 floats are pre-shifted to
    their MSB-first in-word positions (lane-only dependence);
  * a log2(16) masked-roll OR-fold collapses each aligned 16-lane group
    (= 32 consecutive floats) into a bitmap word at the group's lane 0;
  * 16 stride-16 data slabs are gathered into the 8-lane packets of one
    dense 128-lane output row.

16-bit types only (2 floats per word); fp32/fp64 keep the XLA path, where
bitmap packing is a far smaller share of their per-byte budget.
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
