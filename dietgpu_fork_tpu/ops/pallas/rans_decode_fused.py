"""Fused Pallas rANS decoder: whole blocks decoded in VMEM.

One grid cell decodes G blocks: the 32 interleaved states, each block's
compressed words, and the decode LUT stay resident in VMEM for the whole
walk (the reference streams them through shared memory per warp,
GpuANSDecode.cuh:299-403).

TPU-specific scheduling:

* The reference walks output positions from the block tail backwards, so a
  naive port would need a per-block dynamic shift of the emitted symbols.
  Here global iteration i runs each block's decode step k = i - (128 -
  nsteps): blocks of different sizes sit at different k at the same i, and
  the 32 symbols of iteration i always belong to output group 127 - i — a
  static location.
* TPU vector stores cannot target dynamic lane offsets, so the walk is the
  third GRID dimension (32 invocations x 4 decode steps each): per-block
  state/pointer persist in VMEM scratch across grid steps, and the output
  BlockSpec's index_map routes invocation j's (G, 128) byte tile to chunk
  31 - j. Every store is a full static block; Pallas pipelines writebacks.

Layout: quarter-lane (G, 32) tiles — the stream renorm read is a gather
from per-block private tables, which maps to Mosaic's lane-wise
dynamic_gather only when each sublane row owns its table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.constants import (
    ANS_MIN_STATE,
    BLOCK_SIZE,
    STEPS_PER_BLOCK,
    WARP_SIZE,
)

I32 = jnp.int32
U32 = jnp.uint32

_UNROLL = 16  # decode steps per grid invocation (16 x 32 syms = 128 words)


def _seg_suffix_sum32(x: jax.Array) -> jax.Array:
    """Inclusive suffix sum along a 32-wide lane axis: out[l] = sum x[l:]."""
    lane = jax.lax.broadcasted_iota(I32, x.shape, x.ndim - 1)
    for k in (1, 2, 4, 8, 16):
        # cyclic left-shift by k within the 32-wide axis
        shifted = pltpu.roll(x, WARP_SIZE - k, x.ndim - 1)
        x = x + jnp.where(lane < WARP_SIZE - k, shifted, 0)
    return x


def _gather_row128(operand: jax.Array, idx32: jax.Array) -> jax.Array:
    """take_along_axis for (G, 32) indices into (G, 128) rows — Mosaic's
    lane gather needs index/operand shapes to match, so tile the indices
    to 128 lanes and slice the result back."""
    idx128 = pltpu.repeat(idx32, 4, axis=1)
    return jnp.take_along_axis(operand, idx128, axis=1)[:, :WARP_SIZE]


def _decode_kernel(
    stream_ref, cw_ref, uw_ref, st_ref, lut_ref, out_ref,
    states_s, ptr_s, *, prob_bits: int, G: int, SWP: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        states_s[...] = st_ref[...]
        ptr_s[...] = cw_ref[...]

    uw = uw_ref[...]  # (G, 1) int32
    lut = lut_ref[...]  # (LW/128, 128) uint32
    states = states_s[...]
    ptr = ptr_s[...]

    lanes = jax.lax.broadcasted_iota(I32, (G, WARP_SIZE), 1)
    r = ((uw - 1) % WARP_SIZE) + 1
    nsteps = -(-uw // WARP_SIZE)
    mask = U32((1 << prob_bits) - 1)

    def one_step(i, states, ptr):
        k = i - (STEPS_PER_BLOCK - nsteps)
        active = (k >= 0) & (uw > 0)
        lane_valid = active & ((k > 0) | (lanes < r))

        sbar = (states & mask).astype(I32)
        lane_i = sbar & 127
        chunk_i = sbar >> 7
        ent = jnp.zeros((G, WARP_SIZE), U32)
        for c in range(lut.shape[0]):
            g = _gather_row128(
                jnp.broadcast_to(lut[c][None, :], (G, 128)), lane_i
            )
            ent = jnp.where(chunk_i == c, g, ent)

        sym = ent & U32(0xFF)
        pdf = (ent >> U32(8)) & U32(0xFFF)
        smc = ent >> U32(20)
        states = jnp.where(
            lane_valid, pdf * (states >> U32(prob_bits)) + smc, states
        )

        read = lane_valid & (states < U32(ANS_MIN_STATE))
        suffix = _seg_suffix_sum32(read.astype(I32))
        idx16 = ptr - suffix
        idx32 = jnp.clip(idx16 >> 1, 0, SWP - 1)
        s_lane = idx32 & 127
        s_chunk = idx32 >> 7
        w32 = jnp.zeros((G, WARP_SIZE), U32)
        for c in range(SWP // 128):
            g = _gather_row128(stream_ref[:, c * 128 : (c + 1) * 128], s_lane)
            w32 = jnp.where(s_chunk == c, g, w32)
        val = jnp.where((idx16 & 1) == 1, w32 >> U32(16), w32 & U32(0xFFFF))
        states = jnp.where(read, (states << U32(16)) + val, states)
        ptr = ptr - suffix[:, :1]
        sym = jnp.where(lane_valid, sym, U32(0))
        return states, ptr, sym

    lane32 = jax.lax.broadcasted_iota(I32, (G, WARP_SIZE), 1)
    pack_idx = (lane32 * 4) & 31

    def pack4(sym):
        """(G, 32) byte values -> (G, 8) little-endian packed words
        (four static gathers; rolls mis-lower on 32-lane-wide arrays)."""
        b0 = jnp.take_along_axis(sym, pack_idx, axis=1)
        b1 = jnp.take_along_axis(sym, pack_idx + 1, axis=1)
        b2 = jnp.take_along_axis(sym, pack_idx + 2, axis=1)
        b3 = jnp.take_along_axis(sym, pack_idx + 3, axis=1)
        return (
            b0 | (b1 << U32(8)) | (b2 << U32(16)) | (b3 << U32(24))
        )[:, :8]

    words = []
    for u in range(_UNROLL):
        states, ptr, sym = one_step(j * _UNROLL + u, states, ptr)
        words.append(pack4(sym))

    states_s[...] = states
    ptr_s[...] = ptr
    # invocation j covers output groups 127-16j-15 .. 127-16j, i.e. chunk
    # NJ-1-j; within the chunk, the LAST local step produced the FIRST group
    out_ref[...] = jnp.concatenate(words[::-1], axis=1)


@functools.partial(jax.jit, static_argnames=("prob_bits",))
def decode_blocks_fused(
    streams32: jax.Array,
    comp_words: jax.Array,
    uncomp_words: jax.Array,
    states: jax.Array,
    lut: jax.Array,
    prob_bits: int,
) -> jax.Array:
    """Pallas path of ops.rans_decode.decode_blocks: returns uint32-packed
    uint32[B, NB, BLOCK_SIZE/4] (little-endian; zeros in invalid
    positions beyond each block's uncomp_words are masked by callers)."""
    B, NB, SW = streams32.shape
    LW = lut.shape[1]
    G = 256 if NB >= 256 else max(8, -(-NB // 8) * 8)
    NBP = -(-NB // G) * G
    CELLS = NBP // G
    SWP = -(-SW // 128) * 128

    pb = (0, NBP - NB)
    streams = jnp.pad(streams32, ((0, 0), pb, (0, SWP - SW))).reshape(
        B * CELLS, G, SWP
    )
    cw = jnp.pad(comp_words.astype(I32), ((0, 0), pb)).reshape(
        B * CELLS, G, 1
    )
    uw = jnp.pad(uncomp_words.astype(I32), ((0, 0), pb)).reshape(
        B * CELLS, G, 1
    )
    st = jnp.pad(states, ((0, 0), pb, (0, 0))).reshape(B * CELLS, G, 32)
    lut2 = lut.reshape(B, LW // 128, 128)

    cells = CELLS
    NJ = STEPS_PER_BLOCK // _UNROLL

    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, prob_bits=prob_bits, G=G, SWP=SWP
        ),
        grid=(B, CELLS, NJ),
        in_specs=[
            pl.BlockSpec(
                (None, G, SWP), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G, 1), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G, 1), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G, 32), lambda b, t, j: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, LW // 128, 128), lambda b, t, j: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, G, 128),
            lambda b, t, j: (b * cells + t, 0, NJ - 1 - j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B * CELLS, G, BLOCK_SIZE // 4), U32
        ),
        scratch_shapes=[
            pltpu.VMEM((G, 32), U32),
            pltpu.VMEM((G, 1), I32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(streams, cw, uw, st, lut2)
    return out.reshape(B, NBP, BLOCK_SIZE // 4)[:, :NB]
