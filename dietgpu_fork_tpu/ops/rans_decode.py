"""Interleaved 32-state rANS decoder, vectorized for TPU.

TPU-first reformulation of the reference decoder (GpuANSDecode.cuh:56-297).
All blocks advance in lockstep under one ``lax.scan``; the reference's
per-warp reverse walk becomes a uniform 128-iteration schedule:

  iteration k = 0 handles the block's tail partial group of
  r' = ((U-1) mod 32) + 1 lanes; iterations k >= 1 handle full 32-lane
  groups walking toward position 0 (this folds the reference's
  decodeOnePartialWarp / decodeOneWarp split into one masked code path).

The reference's reverse ballot (reading renorm words in descending lane
order, GpuANSDecode.cuh:89-104) becomes a reversed 32-lane cumsum.

Decoded symbols are emitted per step and laid down at the end with a single
per-block constant-shift gather: iteration k lane l decodes position
U - r' - 32k + l, so the time-reversed emission tensor is the output shifted
by (4064 + r' - U) — no scatter needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.constants import (
    ANS_MIN_STATE,
    BLOCK_SIZE,
    STEPS_PER_BLOCK,
    WARP_SIZE,
)
from .bitops import u32

I32 = jnp.int32
U32 = jnp.uint32


def decode_blocks(
    comp32: jax.Array,
    data_off32: jax.Array,
    starts: jax.Array,
    comp_words: jax.Array,
    uncomp_words: jax.Array,
    states: jax.Array,
    lut: jax.Array,
    prob_bits: int,
) -> jax.Array:
    """Decode all blocks of a batch of archives.

    comp32:      uint32[B, CW]   raw archive rows
    data_off32:  int32[B]        uint32 offset of the compressed word stream
    starts:      int32[B, NB]    per-block uint16 word start (16B aligned)
    comp_words:  int32[B, NB]    per-block compressed uint16 word count
    uncomp_words:int32[B, NB]    per-block decoded byte count (0 for unused)
    states:      uint32[B, NB, 32] initial interleaved states
    lut:         uint32[B, 2^prob_bits] decode lookup table

    Returns out: uint8[B, NB, 4096] decoded bytes (zero where invalid).
    """
    B, NB = starts.shape
    lanes = jnp.arange(WARP_SIZE, dtype=I32)

    uw = uncomp_words.astype(I32)
    r = ((uw - 1) % WARP_SIZE) + 1  # tail group width (32 for full blocks)
    nsteps = -(-uw // WARP_SIZE)
    # uint16 index (relative to the member's data section) one past the last
    # unread word; decremented as renorm consumes words.
    base16 = starts + comp_words

    state_mask = u32((1 << prob_bits) - 1)

    def step(carry, k):
        states, ptr = carry
        active = (k < nsteps) & (uw > 0)
        lane_valid = active[:, :, None] & (
            (k > 0) | (lanes[None, None, :] < r[:, :, None])
        )

        s_bar = (states & state_mask).astype(I32)
        ent = jnp.take_along_axis(
            lut, s_bar.reshape(B, -1), axis=1
        ).reshape(s_bar.shape)
        sym = (ent & u32(0xFF)).astype(jnp.uint8)
        pdf = (ent >> u32(8)) & u32(0xFFF)
        smc = ent >> u32(20)

        new_state = pdf * (states >> u32(prob_bits)) + smc
        states = jnp.where(lane_valid, new_state, states)

        read = lane_valid & (states < u32(ANS_MIN_STATE))
        # inclusive count of reading lanes with index >= l
        suffix = jnp.flip(
            jnp.cumsum(jnp.flip(read.astype(I32), axis=2), axis=2), axis=2
        )
        idx16 = 2 * data_off32[:, None, None] + ptr[:, :, None] - suffix
        idx32 = jnp.clip(idx16 >> 1, 0, comp32.shape[1] - 1)
        w32 = jnp.take_along_axis(
            comp32, idx32.reshape(B, -1), axis=1
        ).reshape(idx16.shape)
        val = jnp.where(
            (idx16 & 1) == 1, w32 >> u32(16), w32 & u32(0xFFFF)
        )
        states = jnp.where(read, (states << u32(16)) + val, states)
        ptr = ptr - read.astype(I32).sum(axis=2)
        return (states, ptr), sym

    ks = jnp.arange(STEPS_PER_BLOCK, dtype=I32)
    (_, _), syms = jax.lax.scan(step, (states, base16), ks)

    # syms: (128, B, NB, 32); time-reverse so flat index i within a block
    # holds position (U - r' - 4064) + i, then shift per block.
    flat = jnp.flip(syms, axis=0).transpose(1, 2, 0, 3).reshape(B, NB, BLOCK_SIZE)
    p = jnp.arange(BLOCK_SIZE, dtype=I32)
    shift = (STEPS_PER_BLOCK - 1) * WARP_SIZE + r - uw  # 4064 + r' - U
    gidx = jnp.clip(p[None, None, :] + shift[:, :, None], 0, BLOCK_SIZE - 1)
    out = jnp.take_along_axis(flat, gidx, axis=2)
    return jnp.where(p[None, None, :] < uw[:, :, None], out, jnp.uint8(0))
