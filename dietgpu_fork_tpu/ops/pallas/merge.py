"""Ragged runs-merge: the TPU data-movement engine for archive assembly.

The codec's layouts (ANS coalescing GpuANSEncode.cuh:511-624, float archive
GpuFloatCompress.cuh:506-551, sparse framing, and the decode-side inverse
staging) all reduce to ONE primitive:

    out[dst[r] + i] = src_flat[src[r] + i]   for i < len[r], r = 0..R-1
    out[j] = 0 elsewhere

with destination intervals sorted and non-overlapping (source offsets are
arbitrary). The CUDA reference scatters through per-thread addresses; TPU
has no vector scatter and HBM slices must be tile-aligned, so this kernel
streams the run list as one software-pipelined sequence:

  * runs are pre-split (in jnp) into pieces that never cross an output-tile
    boundary; piece metadata lives in SMEM (one bulk DMA per 16Ki pieces);
  * each piece's source window is DMA'd HBM->VMEM through a ring of
    in-flight buffers (aligned to the 1024-word HBM tiling, static bucket
    sizes), rotated into place with dynamic lane/sublane rolls, and masked
    into a VMEM accumulator tile;
  * finished tiles are flushed to HBM with async ping-pong DMAs.

Everything is a bulk DMA or a full-width VPU op. Off-TPU (CPU tests,
interpret) the same semantics fall back to a searchsorted+gather
formulation (_runs_merge_ref).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32

TILE_WORDS = 8192  # output tile (32 KiB) per flush
_TROWS = TILE_WORDS // 128
_TWB = TILE_WORDS + 2048  # rotation window: piece + 1024-word align slack
_DEPTH = 8  # in-flight piece windows
_G_CAP = 16384  # pieces per grid step (metadata = 256 KiB SMEM)

# static DMA window sizes in KiW (1024 words); bucket 0 = no transfer
_BUCKETS = (0, 1, 2, 3, 4, 6, 8, 10)


def _bucket_id(n):
    """Index of the smallest bucket >= n chunks (n in [0, 10])."""
    return jnp.where(
        n <= 4, n, jnp.where(n <= 6, 5, jnp.where(n <= 8, 6, 7))
    )


def _flat_roll(x: jax.Array, d: jax.Array) -> jax.Array:
    """Roll a (S, 128) array by d positions in flattened row-major order:
    result flat[f] = x flat[(f - d) mod S*128]."""
    q = d // 128
    rl = d % 128
    y = pltpu.roll(x, q, 0)
    z = pltpu.roll(x, q + 1, 0)
    ry = pltpu.roll(y, rl, 1)
    rz = pltpu.roll(z, rl, 1)
    lane = jax.lax.broadcasted_iota(I32, x.shape, 1)
    return jnp.where(lane < rl, rz, ry)


def _merge_kernel(
    meta_ref, src_ref, out_init_ref, out_ref,
    smeta, acc, win, sem_m, sem_w, sem_f, *, n_items: int,
):
    del out_init_ref  # aliased with out_ref (pre-zeroed)
    g = pl.program_id(0)
    g0 = g * _G_CAP
    nit = jnp.minimum(n_items - g0, _G_CAP)

    # metadata for this group -> SMEM (one bulk transfer)
    cpm = pltpu.make_async_copy(
        meta_ref.at[pl.ds(g0 * 4, _G_CAP * 4)], smeta, sem_m
    )
    cpm.start()
    cpm.wait()

    def bounds(l):
        dst_a = smeta[4 * l]
        src_a = smeta[4 * l + 1]
        ln = smeta[4 * l + 2]
        src_lo = src_a
        w0 = src_lo // 1024 * 1024
        nch = jnp.where(ln > 0, (src_lo - w0 + ln + 1023) // 1024, 0)
        return dst_a, src_lo, w0, ln, nch

    def dma_win(l, start: bool):
        _, _, w0, _, nch = bounds(l)
        slot = l % _DEPTH
        row0 = w0 // 128

        def mk(nkw):
            def br():
                cp = pltpu.make_async_copy(
                    src_ref.at[pl.ds(row0, nkw * 8), :],
                    win.at[slot, pl.ds(0, nkw * 8), :],
                    sem_w.at[slot],
                )
                if start:
                    cp.start()
                else:
                    cp.wait()

            return br

        jax.lax.switch(
            _bucket_id(nch), [lambda: None] + [mk(n) for n in _BUCKETS[1:]]
        )

    def flush(tile, p, k):
        """Async: acc[p] -> out tile; returns after freeing acc[p^1]."""
        pltpu.make_async_copy(
            acc.at[p], out_ref.at[pl.ds(tile * _TROWS, _TROWS), :],
            sem_f.at[p],
        ).start()

        @pl.when(k >= 1)
        def _():
            pltpu.make_async_copy(
                acc.at[1 - p],
                out_ref.at[pl.ds(tile * _TROWS, _TROWS), :],
                sem_f.at[1 - p],
            ).wait()

        acc[1 - p] = jnp.zeros((_TROWS, 128), U32)

    # first tile of the group: read back (a previous group may have flushed
    # a partial version of it)
    cur0 = smeta[0] // TILE_WORDS
    cpr = pltpu.make_async_copy(
        out_ref.at[pl.ds(cur0 * _TROWS, _TROWS), :], acc.at[0], sem_f.at[0]
    )
    cpr.start()
    cpr.wait()

    def prologue(l, _):
        @pl.when(l < nit)
        def _():
            dma_win(l, start=True)

        return 0

    jax.lax.fori_loop(0, _DEPTH, prologue, 0, unroll=False)

    def process(l, carry):
        cur, p, k = carry
        dst_a, src_lo, w0, ln, nch = bounds(l)
        t_l = dst_a // TILE_WORDS

        switch = t_l != cur

        def do_switch(args):
            cur, p, k = args
            flush(cur, p, k)
            return t_l, 1 - p, k + 1

        cur, p, k = jax.lax.cond(
            switch, do_switch, lambda a: a, (cur, p, k)
        )

        dma_win(l, start=False)

        @pl.when(ln > 0)
        def _():
            off = dst_a - t_l * TILE_WORDS  # in [0, TILE_WORDS)
            shift = off - (src_lo - w0)
            d = jnp.where(shift < 0, shift + _TWB, shift)
            rolled = _flat_roll(win[l % _DEPTH], d)[:_TROWS]
            row = jax.lax.broadcasted_iota(I32, (_TROWS, 128), 0)
            lane = jax.lax.broadcasted_iota(I32, (_TROWS, 128), 1)
            pos = row * 128 + lane
            m = (pos >= off) & (pos < off + ln)
            acc[p] = jnp.where(m, rolled, acc[p])

        # refill this slot only after the roll has consumed it
        @pl.when(l + _DEPTH < nit)
        def _():
            dma_win(l + _DEPTH, start=True)

        return cur, p, k

    cur, p, k = jax.lax.fori_loop(
        0, nit, process, (cur0, jnp.int32(0), jnp.int32(0)), unroll=False
    )

    # drain: flush the live accumulator, then wait both in-flight flushes
    flush(cur, p, k)
    pltpu.make_async_copy(
        acc.at[p], out_ref.at[pl.ds(cur * _TROWS, _TROWS), :], sem_f.at[p]
    ).wait()


@functools.partial(jax.jit, static_argnames=("out_len",))
def _runs_merge_tpu(src_flat, dst_off, src_off, lens, *, out_len: int):
    R = dst_off.shape[0]
    T = -(-out_len // TILE_WORDS)
    G = R + T

    # clamp so corrupted inputs (e.g. garbage archive headers on the decode
    # capacity-failure path) can never drive a DMA out of bounds
    dst_off = jnp.clip(dst_off.astype(I32), 0, T * TILE_WORDS - 1)
    src_off = jnp.clip(src_off.astype(I32), 0, src_flat.shape[0])
    lens = jnp.clip(
        lens.astype(I32), 0,
        jnp.minimum(
            T * TILE_WORDS - dst_off, src_flat.shape[0] - src_off
        ),
    )

    # split runs into pieces that never cross a TILE_WORDS boundary:
    # breakpoints = run starts  ∪ tile starts
    tile_starts = jnp.arange(T, dtype=I32) * TILE_WORDS
    breaks = jnp.sort(jnp.concatenate([dst_off, tile_starts]))
    nxt = jnp.concatenate([breaks[1:], jnp.full((1,), T * TILE_WORDS, I32)])
    r = jnp.clip(
        jnp.searchsorted(dst_off, breaks, side="right").astype(I32) - 1,
        0, R - 1,
    )
    dst_end = dst_off[r] + lens[r]
    valid = (breaks >= dst_off[r]) & (breaks < dst_end)
    plen = jnp.where(valid, jnp.minimum(nxt, dst_end) - breaks, 0)
    psrc = jnp.where(valid, src_off[r] + (breaks - dst_off[r]), 0)

    meta = jnp.stack(
        [breaks, psrc, plen, jnp.zeros((G,), I32)], axis=1
    ).reshape(-1)
    ng = -(-G // _G_CAP)
    meta = jnp.pad(meta, (0, ng * _G_CAP * 4 - meta.shape[0]))

    # pad source so any aligned window fetch stays in bounds
    pad = (-src_flat.shape[0]) % 1024 + _TWB + 1024
    src2d = jnp.pad(src_flat.astype(U32), (0, pad)).reshape(-1, 128)

    out_init = jnp.zeros((T * _TROWS, 128), U32)

    out = pl.pallas_call(
        functools.partial(_merge_kernel, n_items=G),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((T * _TROWS, 128), U32),
        scratch_shapes=[
            pltpu.SMEM((_G_CAP * 4,), I32),
            pltpu.VMEM((2, _TROWS, 128), U32),
            pltpu.VMEM((_DEPTH, _TWB // 128, 128), U32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((_DEPTH,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(meta, src2d, out_init)
    return out.reshape(-1)[:out_len]


@functools.partial(jax.jit, static_argnames=("out_len",))
def _runs_merge_ref(src_flat, dst_off, src_off, lens, *, out_len: int):
    """Gather formulation (CPU/interpret reference): for each output word,
    locate its run by binary search on the sorted dst intervals."""
    dst_off = dst_off.astype(I32)
    src_off = src_off.astype(I32)
    lens = lens.astype(I32)
    j = jnp.arange(out_len, dtype=I32)
    r = jnp.clip(
        jnp.searchsorted(dst_off, j, side="right").astype(I32) - 1,
        0,
        dst_off.shape[0] - 1,
    )
    inside = (j >= dst_off[r]) & (j < dst_off[r] + lens[r])
    src_idx = jnp.clip(src_off[r] + (j - dst_off[r]), 0, src_flat.shape[0] - 1)
    return jnp.where(inside, src_flat.astype(U32)[src_idx], U32(0))


def runs_merge(
    src_flat: jax.Array,
    dst_off: jax.Array,
    src_off: jax.Array,
    lens: jax.Array,
    out_len: int,
) -> jax.Array:
    """out[dst_off[r]+i] = src_flat[src_off[r]+i] for i < lens[r]; 0 elsewhere.

    Requirements: destination intervals sorted by dst_off and
    non-overlapping; source offsets arbitrary; uint32-word granular.
    Zero-length runs are allowed.
    """
    if jax.default_backend() == "tpu":
        return _runs_merge_tpu(
            src_flat, dst_off, src_off, lens, out_len=out_len
        )
    return _runs_merge_ref(src_flat, dst_off, src_off, lens, out_len=out_len)
