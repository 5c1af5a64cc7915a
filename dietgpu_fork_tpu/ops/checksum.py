"""Batched XOR checksum over masked byte rows.

The reference checksum is the XOR of all input bytes, computed with
vectorized uint32 loads and a final byte-fold (GpuChecksum.cuh:26-93); the
fold makes it exactly equal to a byte-wise XOR reduction, which is how we
compute it — one masked XOR-tree reduction per batch member, a trivially
HBM-bound op on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32


def checksum_batched(data_u8: jax.Array, sizes: jax.Array) -> jax.Array:
    """data_u8: uint8[B, S]; sizes: int32[B] valid byte counts.
    Returns uint32[B] checksums (values in [0, 255])."""
    B, S = data_u8.shape
    pos = jnp.arange(S, dtype=jnp.int32)
    masked = jnp.where(pos[None, :] < sizes[:, None].astype(jnp.int32),
                       data_u8, jnp.uint8(0))
    return jax.lax.reduce(
        masked.astype(U32), U32(0), jax.lax.bitwise_xor, (1,)
    )
