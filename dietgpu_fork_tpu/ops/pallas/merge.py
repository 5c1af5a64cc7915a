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

from ...core.config import use_pallas
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import pallas_call

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

    out = pallas_call(
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


# ---------------------------------------------------------------------------
# v2 engine: sub-piece splitting + dynamic-row stores
# ---------------------------------------------------------------------------

_T2 = 32768  # v2 output tile words (128 KiB)
_T2R = _T2 // 128  # 256 rows
_SUB = 1280  # max short sub-piece words
_WIN = 24  # short DMA window rows (3072 >= 1023 + 127 + _SUB)
_LSUB = 6400  # max long sub-piece words
_LFR = 52  # long frame rows (52*128 >= 127 + _LSUB)
_LWIN = 64  # long DMA window rows (8192 >= 1023 + 127 + _LSUB)
_D2 = 8  # in-flight windows
_K3 = 4096  # aligned direct-DMA chunk words (32 full rows)
_K3R = _K3 // 128
_K3_FLAG = 1 << 20  # marks a kind-3 piece in the meta length field
_DK = 4  # in-flight kind-3 direct DMAs

import os as _os

_K3_OFF = _os.environ.get("DIETTPU_MERGE_K3") == "0"


# source offsets carry their ref index in the bits above _RSH; each ref is
# limited to 2^28 words (1 GiB) of addressable source data and calls are
# limited to 7 refs (offsets stay positive int32). 1 GiB covers the
# reference benchmark maximum (100M fp64 floats -> ~0.9 GiB archive,
# FloatBenchmark.cu:402-428).
_RSH = 28
_RMASK = (1 << _RSH) - 1


def _merge2_kernel(meta_ref, t_s0_ref, *rest, nrefs: int, rsh: int):
    src_refs = rest[:nrefs]
    out_ref = rest[nrefs]
    win, sem_w, sem_k = rest[nrefs + 1 :]
    t = pl.program_id(0)
    s0 = t_s0_ref[t]
    s1 = t_s0_ref[t + 1]
    out_ref[...] = jnp.zeros((_T2R, 128), U32)

    rmask = (1 << rsh) - 1

    def piece(s):
        ln_raw = meta_ref[3 * s + 2]
        enc = meta_ref[3 * s + 1]
        return (
            meta_ref[3 * s], enc & rmask, enc >> rsh,
            ln_raw & (_K3_FLAG - 1), ln_raw >= _K3_FLAG,
        )

    def _class(ln, k3):
        # 0 none | 1 tiny<=384 | 2 mid<=768 | 3 short<=1280 | 4 long | (k3)
        return jnp.where(
            k3 | (ln <= 0), 0,
            jnp.where(
                ln <= 384, 1,
                jnp.where(ln <= 768, 2, jnp.where(ln <= _SUB, 3, 4)),
            ),
        )

    def dma(s, start: bool):
        _, src, rid, ln, k3 = piece(s)
        row0 = (src // 1024) * 8
        slot = s % _D2

        def mk(rows, ref):
            def br():
                cp = pltpu.make_async_copy(
                    ref.at[pl.ds(row0, rows), :],
                    win.at[slot, pl.ds(0, rows), :],
                    sem_w.at[slot],
                )
                if start:
                    cp.start()
                else:
                    cp.wait()

            return br

        # branch index = class * nrefs + rid (class 0 = no transfer)
        branches = [lambda: None] * nrefs + [
            mk(rows, ref)
            for rows in (16, 16, _WIN, _LWIN)
            for ref in src_refs
        ]
        jax.lax.switch(_class(ln, k3) * nrefs + rid, branches)

    def k3_wait(slot):
        # all kind-3 copies share one shape; the wait decrements by size
        pltpu.make_async_copy(
            out_ref.at[pl.ds(0, _K3R), :],
            out_ref.at[pl.ds(0, _K3R), :],
            sem_k.at[slot],
        ).wait()

    def k3_drain(started, waited):
        def w(i, _):
            k3_wait(i % _DK)
            return 0

        jax.lax.fori_loop(waited, started, w, 0, unroll=False)
        return started

    def prologue(i, _):
        @pl.when(s0 + i < s1)
        def _():
            dma(s0 + i, start=True)

        return 0

    jax.lax.fori_loop(0, _D2, prologue, 0, unroll=False)

    def frame_iota(rows):
        return (
            jax.lax.broadcasted_iota(I32, (rows, 128), 0) * 128
            + jax.lax.broadcasted_iota(I32, (rows, 128), 1)
        )

    jj_t = frame_iota(4)
    jj_m = frame_iota(8)
    jj_s = frame_iota(12)
    jj_l = frame_iota(_LFR)

    def place(s, dst, src, ln, rows, wrows, jj):
        dst_t = dst - t * _T2
        r0 = jnp.minimum(dst_t >> 7, _T2R - rows)
        a = dst_t - r0 * 128
        rel2 = (src - (src // 1024) * 1024) - a
        d = jnp.where(rel2 > 0, wrows * 128 - rel2, -rel2)
        rolled = _flat_roll(win[s % _D2, :wrows], d)[:rows]
        m = (jj >= a) & (jj < a + ln)
        cur = out_ref[pl.ds(r0, rows), :]
        out_ref[pl.ds(r0, rows), :] = jnp.where(m, rolled, cur)

    def process(s, carry):
        started, waited = carry
        dst, src, rid, ln, k3 = piece(s)
        dma(s, start=False)

        def do_k3(carry):
            started, waited = carry
            # ring-throttle: at most _DK direct copies in flight
            waited = jax.lax.cond(
                started - waited >= _DK,
                lambda w: (k3_wait(w % _DK), w + 1)[1],
                lambda w: w,
                waited,
            )
            r0 = (dst - t * _T2) // 128

            def k3_start(ref):
                def br():
                    pltpu.make_async_copy(
                        ref.at[pl.ds(src // 128, _K3R), :],
                        out_ref.at[pl.ds(r0, _K3R), :],
                        sem_k.at[started % _DK],
                    ).start()

                return br

            jax.lax.switch(rid, [k3_start(r) for r in src_refs])
            return started + 1, waited

        def do_rmw(carry):
            started, waited = carry
            # RMW reads tile rows: every in-flight direct copy must land
            # first (a clamped frame can reach back into kind-3 rows)
            waited = jax.lax.cond(
                (waited < started) & (ln > 0),
                lambda w: k3_drain(started, w),
                lambda w: w,
                waited,
            )

            def tiny():
                place(s, dst, src, ln, 4, 16, jj_t)

            def mid():
                place(s, dst, src, ln, 8, 16, jj_m)

            def short():
                place(s, dst, src, ln, 12, _WIN, jj_s)

            def longp():
                place(s, dst, src, ln, _LFR, _LWIN, jj_l)

            jax.lax.switch(
                _class(ln, False),
                [lambda: None, tiny, mid, short, longp],
            )
            return started, waited

        started, waited = jax.lax.cond(k3, do_k3, do_rmw, (started, waited))

        @pl.when(s + _D2 < s1)
        def _():
            dma(s + _D2, start=True)

        return started, waited

    started, waited = jax.lax.fori_loop(
        s0, s1, process, (jnp.int32(0), jnp.int32(0)), unroll=False
    )
    jax.lax.cond(
        waited < started,
        lambda w: k3_drain(started, w),
        lambda w: w,
        waited,
    )


def _src_rows_needed(cap_words: int) -> int:
    """Rows a source ref must span so every window/k3 DMA against offsets
    clamped to cap_words stays in bounds."""
    return (cap_words // 1024) * 8 + _LWIN + 8


_SMEM_META_BUDGET = 512 * 1024  # bytes of piece metadata per pallas call


def _meta_bytes(R: int, out_len: int) -> int:
    """Worst-case scalar-prefetch (SMEM) footprint of one v2 merge call:
    meta is 3 int32 per work slot, t_s0 is T+1 int32. SMEM is 1 MiB per
    core and the compiler needs room for its own scalars, so calls are
    split when this exceeds _SMEM_META_BUDGET (a 100M-float fp64 archive
    merge otherwise dies with 'Allocation would exceed memory (space=smem)')."""
    T = -(-out_len // _T2)
    R2 = 2 * (R + T) + out_len // _K3
    return 12 * R2 + 4 * (T + 1)


def _runs_merge_tpu2(srcs, dst_off, src_off, lens, *, out_len: int, caps,
                     rsh: int = _RSH):
    """SMEM-budget dispatch around the single-call v2 kernel: when the
    piece metadata for (R runs, out_len words) would overflow SMEM, the
    output is split into tile-aligned chunks, every run is CLIPPED to each
    chunk's destination window (runs are sorted and non-overlapping, so
    clipping preserves the contract; at most one run straddles each
    boundary), and the chunk outputs are concatenated. The per-chunk
    metadata keeps the full 2R run-slot term but scales the T and
    out_len/_K3 terms by 1/C, which is what overflows for huge archives.
    If 2R alone busts the budget (hundreds of thousands of runs), fall
    back to the XLA gather formulation — correct, slower, and only
    reachable for classic-layout archives far beyond the benchmark
    protocol sizes."""
    R = dst_off.shape[0]
    if _meta_bytes(R, out_len) <= _SMEM_META_BUDGET:
        return _runs_merge_tpu2_single(
            srcs, dst_off, src_off, lens, out_len=out_len, caps=caps, rsh=rsh
        )
    T = -(-out_len // _T2)
    for C in range(2, 65):
        Tc = -(-T // C)
        if _meta_bytes(R, (Tc + 1) * _T2) <= _SMEM_META_BUDGET:
            break
    else:
        return _runs_merge_ref(
            tuple(srcs), dst_off, src_off, lens, out_len=out_len, rsh=rsh
        )

    dst_off = dst_off.astype(I32)
    src_off = src_off.astype(I32)
    lens = lens.astype(I32)
    rmask = jnp.int32((1 << rsh) - 1)
    rid_bits = src_off & ~rmask
    soff = src_off & rmask
    parts = []
    base = 0
    while base < out_len:
        wlen = min(Tc * _T2, out_len - base)
        start = jnp.clip(dst_off, base, base + wlen)
        end = jnp.clip(dst_off + lens, base, base + wlen)
        shift = start - dst_off
        # one PAD tile beyond wlen: runs clipped empty at the window end
        # land at dst == wlen, which must stay a harmless break OUTSIDE
        # every live interval. Without the pad the single-call clamps
        # them to wlen-1, where their break steals the window's last
        # word from the live run covering it (the dead run then "owns"
        # that word and, being invalid, never writes it).
        parts.append(
            _runs_merge_tpu2_single(
                srcs,
                start - base,
                jnp.minimum(soff + shift, rmask) | rid_bits,
                jnp.maximum(end - start, 0),
                out_len=wlen + _T2,
                caps=caps,
                rsh=rsh,
            )[:wlen]
        )
        base += wlen
    return jnp.concatenate(parts)


@functools.partial(
    jax.jit, static_argnames=("out_len", "caps", "rsh"),
)
def _runs_merge_tpu2_single(srcs, dst_off, src_off, lens, *, out_len: int,
                            caps, rsh: int = _RSH):
    """v2: split runs into <=_SUB-word sub-pieces that never cross a _T2
    output-tile boundary; each sub-piece is one small aligned DMA window,
    one flat roll, and one 12-row read-modify-write into the tile — no
    full-tile masking and no per-piece size switch (v1 cost ~300ns/piece,
    v2 ~60ns).

    srcs: tuple of (rows, 128) uint32 source refs; src_off encodes the ref
    index in bits >= _RSH and a word offset below. caps[i] bounds ref i's
    addressable words; refs shorter than _src_rows_needed(caps[i]) rows are
    padded here (callers avoid that copy by over-allocating)."""
    nrefs = len(srcs)
    R = dst_off.shape[0]
    T = -(-out_len // _T2)

    rmask = (1 << rsh) - 1
    assert nrefs <= max(1, (1 << (31 - rsh)) - 1), "too many refs for rsh"
    srcs = list(srcs)
    for i, s in enumerate(srcs):
        assert caps[i] < (1 << rsh), (
            f"source ref exceeds 2^{rsh} words"
        )
        need = _src_rows_needed(caps[i])
        if s.shape[0] < need:
            srcs[i] = jnp.pad(s, ((0, need - s.shape[0]), (0, 0)))

    caps_d = jnp.asarray(caps, I32)
    dst_off = jnp.clip(dst_off.astype(I32), 0, T * _T2 - 1)
    src_off = src_off.astype(I32)
    rid = jax.lax.shift_right_logical(src_off, I32(rsh))
    soff = src_off & rmask
    cap_r = caps_d[jnp.clip(rid, 0, nrefs - 1)]
    rid = jnp.clip(rid, 0, nrefs - 1)
    soff = jnp.minimum(soff, cap_r)
    src_off = soff | (rid << I32(rsh))
    lens = jnp.clip(
        lens.astype(I32), 0,
        jnp.minimum(T * _T2 - dst_off, cap_r - soff),
    )

    # split at tile boundaries (breakpoints = run starts U tile starts).
    # NOTE: XLA sort/searchsorted lower to serial gather chains on TPU
    # (~1 ms at a few thousand runs), so the merged break list is built
    # with broadcast compare-sums and two scatters instead — both sides
    # are already sorted.
    tile_starts = jnp.arange(T, dtype=I32) * _T2
    G = R + T
    # rank of each dst among tile starts is analytic; rank of each tile
    # start among (sorted) dst is a compare-sum
    pos_d = jnp.arange(R, dtype=I32) + (dst_off // _T2) + 1
    cmp = dst_off[None, :] <= tile_starts[:, None]  # (T, R)
    d_leq_tile = jnp.sum(cmp, axis=1).astype(I32)
    d_lt_tile = jnp.sum(
        dst_off[None, :] < tile_starts[:, None], axis=1
    ).astype(I32)
    pos_t = jnp.arange(T, dtype=I32) + d_lt_tile
    breaks = (
        jnp.zeros((G,), I32).at[pos_d].set(dst_off).at[pos_t].set(tile_starts)
    )
    # owning run r: for a dst break it is the run itself; for a tile start
    # it is the last run with dst <= it (duplicate-dst runs only occur at
    # zero length, which the validity test below discards)
    r = (
        jnp.zeros((G,), I32)
        .at[pos_d]
        .set(jnp.arange(R, dtype=I32))
        .at[pos_t]
        .set(jnp.clip(d_leq_tile - 1, 0, R - 1))
    )
    nxt = jnp.concatenate([breaks[1:], jnp.full((1,), T * _T2, I32)])
    dst_end = dst_off[r] + lens[r]
    valid = (breaks >= dst_off[r]) & (breaks < dst_end)
    plen = jnp.where(valid, jnp.minimum(nxt, dst_end) - breaks, 0)
    psrc = jnp.where(valid, src_off[r] + (breaks - dst_off[r]), 0)

    # split pieces into kernel work items. Misaligned long pieces become
    # <=_LSUB-word sub-pieces (window DMA + flat roll + frame RMW). Pieces
    # whose src and dst agree mod 128 instead become: a short head up to
    # the next dst row boundary, full-row _K3-word chunks moved by DIRECT
    # src->tile DMA (no window, no roll — flagged via _K3_FLAG), and a
    # <=_K3 long tail. The slot->piece map p[slot] = #{ends <= slot} is a
    # scatter-add + cumsum, not a searchsorted.
    R2 = 2 * G + out_len // _K3
    # _RSH is a multiple of 128's log, so the encoded src's low 7 bits are
    # the true source alignment
    aligned = (((psrc - breaks) % 128) == 0) & (plen >= 2 * _K3)
    if _K3_OFF:
        aligned = aligned & False
    h = jnp.where(aligned, (-breaks) % 128, 0)
    m = jnp.where(aligned, (plen - h) // _K3, 0)
    nsub = jnp.where(
        aligned, m + 2, jnp.where(plen > _SUB, -(-plen // _LSUB), 1)
    )
    ends = jnp.cumsum(nsub)
    z = jnp.zeros((R2,), I32).at[jnp.clip(ends, 0, R2 - 1)].add(
        jnp.where(ends < R2, 1, 0)
    )
    p = jnp.clip(jnp.cumsum(z), 0, G - 1)
    # expansion gathers are TPU-serial (~33 us per gather at a few thousand
    # pieces), so everything the per-slot math needs rides FOUR gathers:
    # breaks, psrc, sub-piece start, and a packed word of
    # plen (<= _T2, 16b) | h (7b) | m (<= _T2/_K3, 4b) | aligned (1b)
    start = ends - nsub
    pk = (
        plen
        | (h << 16)
        | (m << 23)
        | (aligned.astype(I32) << 27)
    )
    g_brk = breaks[p]
    g_src = psrc[p]
    g_start = start[p]
    g_pack = pk[p]
    plen_p = g_pack & 0xFFFF
    h_p = (g_pack >> 16) & 0x7F
    m_p = (g_pack >> 23) & 0xF
    al_p = (g_pack >> 27) == 1
    tail_p = h_p + m_p * _K3
    nsub_p = jnp.where(
        al_p, m_p + 2, jnp.where(plen_p > _SUB, -(-plen_p // _LSUB), 1)
    )
    kidx = jnp.arange(R2, dtype=I32) - g_start
    off = jnp.where(
        al_p,
        jnp.where(
            kidx == 0, 0,
            jnp.where(kidx <= m_p, h_p + (kidx - 1) * _K3, tail_p),
        ),
        kidx * _LSUB,
    )
    len_k = jnp.where(
        al_p,
        jnp.where(
            kidx == 0, h_p,
            jnp.where(kidx <= m_p, _K3, plen_p - tail_p),
        ),
        jnp.clip(
            plen_p - kidx * _LSUB, 0,
            jnp.where(plen_p > _SUB, _LSUB, _SUB),
        ),
    )
    flag = al_p & (kidx >= 1) & (kidx <= m_p)
    live = (kidx >= 0) & (kidx < nsub_p) & (len_k > 0)
    koff = jnp.clip(off, 0, jnp.maximum(plen_p - 1, 0))
    sdst = g_brk + koff
    ssrc = g_src + koff
    slen = jnp.where(live, len_k + flag.astype(I32) * _K3_FLAG, 0)

    meta = jnp.stack([sdst, ssrc, slen], axis=1).reshape(-1)
    t_s0 = jnp.sum(
        sdst[None, :] < tile_starts[:, None], axis=1
    ).astype(I32)
    t_s0 = jnp.concatenate([t_s0, jnp.full((1,), R2, I32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nrefs,
        out_specs=pl.BlockSpec(
            (_T2R, 128), lambda t, m_, s_: (t, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_D2, _LWIN, 128), U32),
            pltpu.SemaphoreType.DMA((_D2,)),
            pltpu.SemaphoreType.DMA((_DK,)),
        ],
    )
    out = pallas_call(
        functools.partial(_merge2_kernel, nrefs=nrefs, rsh=rsh),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * _T2R, 128), U32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(meta, t_s0, *[s.astype(U32) for s in srcs])
    return out.reshape(-1)[:out_len]


@functools.partial(jax.jit, static_argnames=("out_len", "rsh"))
def _runs_merge_ref(srcs, dst_off, src_off, lens, *, out_len: int,
                    rsh: int = _RSH):
    """Gather formulation (CPU/interpret reference): for each output word,
    locate its run by binary search on the sorted dst intervals. Multi-ref
    src offsets are resolved by flattening the refs end to end."""
    bases = []
    acc = 0
    flats = []
    for s in srcs:
        bases.append(acc)
        flats.append(s.reshape(-1))
        acc += flats[-1].shape[0]
    src_flat = flats[0] if len(flats) == 1 else jnp.concatenate(flats)
    bases_d = jnp.asarray(bases, I32)

    dst_off = dst_off.astype(I32)
    src_off = src_off.astype(I32)
    rid = jnp.clip(
        jax.lax.shift_right_logical(src_off, I32(rsh)), 0, len(srcs) - 1
    )
    src_off = (src_off & jnp.int32((1 << rsh) - 1)) + bases_d[rid]
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
    # single-ref calls never carry a ref id in the offsets, so they get
    # the full 30-bit word range (4 GiB source) instead of _RSH's 1 GiB —
    # a 256 x 512Ki fp64 batch already stages >1 GiW of archive rows
    if use_pallas():
        cap = src_flat.shape[0]
        pad = _src_rows_needed(cap) * 128 - cap  # one pad covers the slack
        src2d = jnp.pad(src_flat.astype(U32), (0, pad)).reshape(-1, 128)
        return _runs_merge_tpu2(
            (src2d,), dst_off, src_off, lens, out_len=out_len, caps=(cap,),
            rsh=30,
        )
    return _runs_merge_ref(
        (src_flat,), dst_off, src_off, lens, out_len=out_len, rsh=30
    )


def runs_merge_multi(
    srcs,
    caps,
    dst_off: jax.Array,
    src_off: jax.Array,
    lens: jax.Array,
    out_len: int,
) -> jax.Array:
    """Multi-source runs merge: like runs_merge, but sources stay SEPARATE
    (rows, 128)-shaped uint32 refs — no concatenation/retiling of the
    source blob. src_off[r] encodes (ref_index << 27) | word_offset; caps[i]
    bounds ref i's addressable words. Refs whose rows already cover
    _src_rows_needed(caps[i]) (over-allocation at the producer) incur ZERO
    copies here — the archive assembly path this was built for
    (GpuANSEncode.cuh:511-624's coalesce, done as DMAs instead of a
    gather)."""
    caps = tuple(int(c) for c in caps)
    if use_pallas():
        return _runs_merge_tpu2(
            tuple(srcs), dst_off, src_off, lens, out_len=out_len, caps=caps
        )
    return _runs_merge_ref(
        tuple(srcs), dst_off, src_off, lens, out_len=out_len
    )
