"""Fused Pallas rANS decoder: whole blocks decoded in VMEM, full-lane.

One grid cell decodes G blocks laid out FOUR PER 128-LANE ROW (lane group
q = block 4*g4+q): every elementwise op and the shared-LUT gather run at
full vector width; only the per-block compressed-stream read needs four
slab-selected gathers. The interleaved states, streams, and LUT stay
resident in VMEM for the whole walk (the reference streams them through
shared memory per warp, GpuANSDecode.cuh:299-403).

TPU-specific scheduling:

* The reference walks output positions from the block tail backwards, so a
  naive port would need a per-block dynamic shift of the emitted symbols.
  Here global iteration i runs each block's decode step k = i - (128 -
  nsteps): blocks of different sizes sit at different k at the same i, and
  the 32 symbols of iteration i always belong to output group 127 - i — a
  static location.
* TPU vector stores cannot target dynamic lane offsets, so the walk is the
  third GRID dimension (8 invocations x 16 decode steps each): per-block
  state/pointer persist in VMEM scratch across grid steps, and the output
  BlockSpec's index_map routes invocation j's word tile to chunk 7 - j.
* Streams are staged chunk-major ((chunks, G4, 4, 128) words) so the
  renorm read loops only over the chunks the cell's largest stream
  actually reaches (scalar-prefetched bound), not the worst-case 11.
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

_UNROLL = 16  # decode steps per grid invocation
_NJ = STEPS_PER_BLOCK // _UNROLL


def _seg_suffix_sum32(x: jax.Array) -> jax.Array:
    """Inclusive suffix sum within each aligned 32-lane group."""
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(I32, x.shape, x.ndim - 1)
    gl = lane % WARP_SIZE
    for k in (1, 2, 4, 8, 16):
        shifted = pltpu.roll(x, n - k, x.ndim - 1)
        x = x + jnp.where(gl < WARP_SIZE - k, shifted, 0)
    return x


def _decode_kernel(
    ncs_ref, stream_ref, cw_ref, uw_ref, st_ref, lut_ref, out_ref,
    states_s, ptr_s, *, prob_bits: int, G4: int, SWC: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        states_s[...] = st_ref[...]
        ptr_s[...] = cw_ref[...]

    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    ncmax = ncs_ref[cell]
    uw = uw_ref[...]  # (G4, 128) int32: block byte count per lane
    lut = lut_ref[...]  # (LW/128, 128)
    states = states_s[...]
    ptr = ptr_s[...]

    lane = jax.lax.broadcasted_iota(I32, (G4, 128), 1)
    gl = lane % WARP_SIZE
    grp = lane >> 5
    r = ((uw - 1) % WARP_SIZE) + 1
    nsteps = -(-uw // WARP_SIZE)
    mask = U32((1 << prob_bits) - 1)
    # hoist the per-chunk LUT broadcasts out of the 16-step unroll
    lut_bc = [
        jnp.broadcast_to(lut[c][None, :], (G4, 128))
        for c in range(lut.shape[0])
    ]

    def one_step(i, states, ptr):
        k = i - (STEPS_PER_BLOCK - nsteps)
        active = (k >= 0) & (uw > 0)
        lane_valid = active & ((k > 0) | (gl < r))

        sbar = (states & mask).astype(I32)
        lane_i = sbar & 127
        chunk_i = sbar >> 7
        ent = jnp.zeros((G4, 128), U32)
        for c in range(len(lut_bc)):
            g = jnp.take_along_axis(lut_bc[c], lane_i, axis=1)
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
        idx32 = jnp.clip(idx16 >> 1, 0, SWC * 128 - 1)
        s_lane = idx32 & 127
        s_chunk = idx32 >> 7

        def rd(c, w32):
            for q in range(4):
                g = jnp.take_along_axis(stream_ref[c, :, q, :], s_lane, axis=1)
                w32 = jnp.where((s_chunk == c) & (grp == q), g, w32)
            return w32

        w32 = jax.lax.fori_loop(
            0, ncmax, rd, jnp.zeros((G4, 128), U32), unroll=False
        )
        val = jnp.where((idx16 & 1) == 1, w32 >> U32(16), w32 & U32(0xFFFF))
        states = jnp.where(read, (states << U32(16)) + val, states)
        # per-block total = suffix at the group's first lane
        tot = jnp.take_along_axis(suffix, grp * 32, axis=1)
        ptr = ptr - tot
        sym = jnp.where(lane_valid, sym, U32(0))
        return states, ptr, sym

    pack_idx = 32 * (lane >> 3) + 4 * (lane & 7)

    def pack(sym):
        """(G4, 128) bytes -> (G4, 32) words [q*8 + k] (4 blocks x 8)."""
        b0 = jnp.take_along_axis(sym, pack_idx, axis=1)
        b1 = jnp.take_along_axis(sym, pack_idx + 1, axis=1)
        b2 = jnp.take_along_axis(sym, pack_idx + 2, axis=1)
        b3 = jnp.take_along_axis(sym, pack_idx + 3, axis=1)
        return (
            b0 | (b1 << U32(8)) | (b2 << U32(16)) | (b3 << U32(24))
        )[:, :32]

    words = []
    for u in range(_UNROLL):
        states, ptr, sym = one_step(j * _UNROLL + u, states, ptr)
        words.append(pack(sym))

    states_s[...] = states
    ptr_s[...] = ptr
    # invocation j covers groups 127-16j-15..127-16j = word chunk 7-j of
    # each block; the LAST local step produced the chunk's FIRST 8 words
    for q in range(4):
        out_ref[:, q, :] = jnp.concatenate(
            [w[:, q * 8 : (q + 1) * 8] for w in words[::-1]], axis=1
        )


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
    uint32[B, NB, BLOCK_SIZE/4] (zeros beyond each block's size are the
    callers' responsibility to mask)."""
    B, NB, SW = streams32.shape
    LW = lut.shape[1]
    G = 256 if NB >= 256 else max(8, -(-NB // 8) * 8)
    G4 = G // 4
    NBP = -(-NB // G) * G
    CELLS = NBP // G
    SWC = -(-SW // 128)

    pb = (0, NBP - NB)
    # chunk-major stream staging: [cell, chunk, g4, q, lane]
    streams = (
        jnp.pad(streams32, ((0, 0), pb, (0, SWC * 128 - SW)))
        .reshape(B * CELLS, G4, 4, SWC, 128)
        .transpose(0, 3, 1, 2, 4)
    )
    cwp = jnp.pad(comp_words.astype(I32), ((0, 0), pb)).reshape(
        B * CELLS, G4, 4
    )
    # per-cell bound on stream chunks touched
    ncs = (
        (jnp.max(cwp.reshape(B * CELLS, G4 * 4), axis=1) + 1) // 2 + 127
    ) // 128 + 1
    ncs = jnp.minimum(ncs, SWC).astype(I32)

    def rep32(a):  # (B*C, G4, 4) -> (B*C, G4, 128) per-lane copy
        return jnp.repeat(a[:, :, :, None], 32, axis=3).reshape(
            B * CELLS, G4, 128
        )

    cw = rep32(cwp)
    uw = rep32(
        jnp.pad(uncomp_words.astype(I32), ((0, 0), pb)).reshape(
            B * CELLS, G4, 4
        )
    )
    st = jnp.pad(states, ((0, 0), pb, (0, 0))).reshape(B * CELLS, G4, 128)
    lut2 = lut.reshape(B, LW // 128, 128)

    cells = CELLS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, CELLS, _NJ),
        in_specs=[
            pl.BlockSpec(
                (None, SWC, G4, 4, 128),
                lambda b, t, j, ncs: (b * cells + t, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128),
                lambda b, t, j, ncs: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128),
                lambda b, t, j, ncs: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, G4, 128),
                lambda b, t, j, ncs: (b * cells + t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, LW // 128, 128),
                lambda b, t, j, ncs: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, G4, 4, 128),
            lambda b, t, j, ncs: (b * cells + t, 0, 0, _NJ - 1 - j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((G4, 128), U32),
            pltpu.VMEM((G4, 128), I32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, prob_bits=prob_bits, G4=G4, SWC=SWC
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B * CELLS, G4, 4, _NJ * 128), U32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(ncs, streams, cw, uw, st, lut2)
    return out.reshape(B, NBP, BLOCK_SIZE // 4)[:, :NB]
