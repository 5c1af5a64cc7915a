"""Batched 256-bin byte histograms.

The reference builds per-warp shared-memory histograms with atomics
(GpuANSStatistics.cuh:21-134). TPU has no fast vector scatter, so we offer
two formulations and pick per backend:

* ``onehot``: chunked compare-and-reduce. XLA fuses the (chunk, 256)
  comparison into the reduction, so nothing large materializes; cost is one
  VPU compare+add per (byte, symbol) pair within a chunk.
* ``scatter``: jnp scatter-add; fine on CPU, serializes on TPU.

The Pallas fused split+histogram kernel (ops/pallas/) supersedes both on the
encode hot path; this module remains the reference implementation and the
fallback for odd shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import NUM_SYMBOLS

I32 = jnp.int32
U32 = jnp.uint32


def histogram_batched(
    data_u8: jax.Array,
    sizes: jax.Array,
    method: str = "scatter",
    chunk: int = 1 << 16,
) -> jax.Array:
    """data_u8: uint8[B, S]; sizes: int32[B]. Returns uint32[B, 256]."""
    B, S = data_u8.shape
    pos = jnp.arange(S, dtype=I32)
    valid = pos[None, :] < sizes[:, None].astype(I32)

    if method == "scatter":
        b_idx = jnp.broadcast_to(jnp.arange(B, dtype=I32)[:, None], (B, S))
        hist = jnp.zeros((B, NUM_SYMBOLS), I32).at[
            b_idx, data_u8.astype(I32)
        ].add(valid.astype(I32))
        return hist.astype(U32)

    if method == "onehot":
        syms = jnp.arange(NUM_SYMBOLS, dtype=jnp.uint8)
        nchunks = -(-S // chunk)
        pad = nchunks * chunk - S
        x = jnp.pad(data_u8, ((0, 0), (0, pad)))
        v = jnp.pad(valid, ((0, 0), (0, pad)))
        x = x.reshape(B, nchunks, chunk)
        v = v.reshape(B, nchunks, chunk)

        def body(i, acc):
            eq = (x[:, i, :, None] == syms[None, None, :]) & v[:, i, :, None]
            return acc + eq.astype(I32).sum(axis=1)

        hist = jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((B, NUM_SYMBOLS), I32)
        )
        return hist.astype(U32)

    raise ValueError(f"unknown histogram method {method!r}")
