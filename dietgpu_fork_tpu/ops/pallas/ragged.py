"""Ragged block placement/extraction at dynamic offsets.

The archive format stores each block's compressed words at a data-dependent
16-byte-aligned offset (GpuANSEncode.cuh:511-624). Three formulations were
measured on TPU v5e:

  * elementwise XLA gather/scatter:          ~0.1 GB/s (serial loop)
  * Pallas DMA with dynamic slices:          rejected — Mosaic requires
    (8,128)-tile (4 KiB) aligned slice shapes/offsets; the format's offsets
    are 16 B-granular
  * gather-of-slices (vmap'd dynamic_slice) and a sequential fori_loop of
    dynamic_update_slice (XLA aliases the buffer in place): 2.5-4 GB/s

so the last formulation is used; it also runs everywhere (CPU tests).

ragged_place: out_flat[off[r] : off[r]+K] = src[r, :], rows ascending.
A row's zero tail is overwritten by the next row's payload, reproducing
contiguous placement with zero padding after the last row (callers leave K
words of slack at the end of out_flat and a dump offset for masked rows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32


def ragged_place(
    src: jax.Array, offsets: jax.Array, out_flat: jax.Array
) -> jax.Array:
    """Sequentially place src rows at offsets (clamped). Donate out_flat."""
    R, K = src.shape
    total = out_flat.shape[0]
    idx = jnp.clip(offsets.astype(I32), 0, total - K)

    def body(r, out):
        return jax.lax.dynamic_update_slice(out, src[r], (idx[r],))

    return jax.lax.fori_loop(0, R, body, out_flat)


def ragged_extract(
    src_flat: jax.Array, offsets: jax.Array, rows: int, width: int
) -> jax.Array:
    """dst[r, :] = src_flat[offsets[r] : offsets[r]+width] (clamped)."""
    total = src_flat.shape[0]
    idx = jnp.clip(offsets.astype(I32), 0, total - width)
    return jax.vmap(
        lambda o: jax.lax.dynamic_slice(src_flat, (o,), (width,))
    )(idx)
