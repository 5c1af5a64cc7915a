"""Pallas chunked table-lookup: the TPU gather primitive for the codec.

XLA's gather on TPU lowers to a serial loop (~7 ns/element measured on
v5e); Mosaic's `tpu.dynamic_gather` along lanes runs vector-wide
(~0.06 ns/element). This op expresses an arbitrary (B, N)-indices lookup
into per-member (B, H) tables as ceil(H/128) lane-gathers + selects, which
is the fastest arbitrary-gather formulation available through Mosaic on
v5e (sublane dynamic_gather is limited to 8 rows; subword gathers do not
lower).

This single primitive replaces:
  * the encoder's per-position table pre-gather (pdf/cdf/shift, magic),
  * the decoder's per-step LUT lookups (2^prob_bits entries),
  * the decoder's renorm stream reads (per-block 2560-entry streams),
  * the block-shift layout gather at the end of decode.

Falls back to jnp.take_along_axis off-TPU (CPU tests, interpret mode).
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

# rows of indices processed per grid step
_TILE_ROWS = 512


def _lookup_kernel(tab_ref, idx_ref, out_ref, *, chunks: int):
    """tab_ref: (1, chunks, 128) u32 (one member's table, zero padded);
    idx_ref/out_ref: (1, 1, TILE, 128)."""
    idx = idx_ref[0, 0]
    lane = idx & 127
    chunk = idx >> 7
    acc = jnp.zeros(idx.shape, U32)
    for c in range(chunks):
        row = tab_ref[0, c, :]  # (128,)
        src = jnp.broadcast_to(row[None, :], idx.shape)
        g = jnp.take_along_axis(src, lane, axis=1)
        acc = jnp.where(chunk == c, g, acc)
    out_ref[0, 0] = acc


def _pad_cols(x, mult):
    pad = (-x.shape[-1]) % mult
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def _rowwise_kernel(tab_ref, idx_ref, out_ref, *, chunks: int):
    """tab_ref: (TILE_R, chunks, 128); idx_ref/out_ref: (TILE_R, 128).
    Each row gathers from its own table."""
    idx = idx_ref[:]
    lane = idx & 127
    chunk = idx >> 7
    acc = jnp.zeros(idx.shape, U32)
    for c in range(chunks):
        g = jnp.take_along_axis(tab_ref[:, c, :], lane, axis=1)
        acc = jnp.where(chunk == c, g, acc)
    out_ref[:] = acc


_ROW_TILE = 256


@functools.partial(jax.jit, static_argnames=("interpret",))
def rowwise_lookup(
    tables: jax.Array, idx: jax.Array, interpret: bool = False
) -> jax.Array:
    """values[r, k] = tables[r, idx[r, k]] with a *private table per row*.

    tables: uint32[R, H]; idx: int32[R, K] with K <= 128 (padded to 128
    lanes internally). Used for the decoder's renorm stream reads, where
    each block reads from its own compressed stream.
    """
    R, H = tables.shape
    _, K = idx.shape
    if jax.default_backend() != "tpu" or interpret:
        safe = jnp.clip(idx, 0, H - 1)
        return jnp.take_along_axis(tables, safe, axis=1)

    assert K <= 128
    chunks = -(-H // 128)
    tab = _pad_cols(tables, 128).reshape(R, chunks, 128)
    idxp = jnp.pad(jnp.clip(idx, 0, H - 1), ((0, (-R) % _ROW_TILE), (0, 128 - K)))
    Rp = idxp.shape[0]
    if tab.shape[0] < Rp:
        tab = jnp.pad(tab, ((0, Rp - R), (0, 0), (0, 0)))
    tiles = Rp // _ROW_TILE

    out = pallas_call(
        functools.partial(_rowwise_kernel, chunks=chunks),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(
                (_ROW_TILE, chunks, 128), lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_ROW_TILE, 128), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (_ROW_TILE, 128), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Rp, 128), U32),
    )(tab, idxp)
    return out[:R, :K]


@functools.partial(jax.jit, static_argnames=("interpret",))
def chunked_lookup(
    tables: jax.Array, idx: jax.Array, interpret: bool = False
) -> jax.Array:
    """values[b, n] = tables[b, idx[b, n]] (indices clamped to [0, H)).

    tables: uint32[B, H]; idx: int32[B, N]. H should be modest (<= a few
    thousand): cost scales with ceil(H/128) vector ops per element.
    """
    B, H = tables.shape
    _, N = idx.shape
    if jax.default_backend() != "tpu" or interpret:
        safe = jnp.clip(idx, 0, H - 1)
        return jnp.take_along_axis(tables, safe, axis=1)

    chunks = -(-H // 128)
    tab = _pad_cols(tables, 128).reshape(B, chunks, 128)

    idx = jnp.clip(idx, 0, H - 1)
    idxp = _pad_cols(idx, _TILE_ROWS * 128)
    Np = idxp.shape[1]
    tiles = Np // (_TILE_ROWS * 128)
    idxp = idxp.reshape(B, tiles, _TILE_ROWS, 128)

    out = pallas_call(
        functools.partial(_lookup_kernel, chunks=chunks),
        grid=(B, tiles),
        in_specs=[
            pl.BlockSpec(
                (1, chunks, 128), lambda b, t: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, _TILE_ROWS, 128), lambda b, t: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, _TILE_ROWS, 128), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, tiles, _TILE_ROWS, 128), U32),
    )(tab, idxp)
    return out.reshape(B, Np)[:, :N]
