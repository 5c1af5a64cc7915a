"""Batched ANS codec pipelines: archive assembly and parsing on device.

This is the TPU equivalent of ansEncodeBatchDevice / ansDecodeBatch
(GpuANSEncode.cuh:670-845, GpuANSDecode.cuh:478-596). Everything is
static-shape and jit-friendly:

* Batch members live in rows of a padded (B, S) matrix with an explicit
  sizes vector — the reference's Stride calling convention. Pointer and
  SplitSize conventions are host-side wrappers (api/codec.py).
* Archive layout offsets depend on the dynamic per-member block count, so
  assembly is expressed as a gather cascade over output words: every output
  uint32 selects its source (header / probs / states / blockWords / stream)
  from region arithmetic. The inverse (parsing) is plain gathers.
* Compressed outputs are zero-padded to the worst-case row size given by
  ``max_compressed_size`` — same buffer contract as the reference API, but
  with deterministic (zero) padding instead of garbage.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.constants import (
    BLOCK_SIZE,
    NUM_SYMBOLS,
    max_compressed_size,
)
from ..ops.bitops import bitcast_u32_to_u8, bitcast_u8_to_u32, u32
from ..ops.checksum import checksum_batched
from ..ops.histogram import histogram_batched
from ..ops.rans_decode import decode_blocks
from ..ops.rans_encode import MAX_BLOCK_WORDS32, encode_blocks
from ..ops.table import (
    build_decode_table_batched,
    normalize_probs_batched,
    pack_encode_table,
)

I32 = jnp.int32
U32 = jnp.uint32

_ANS_MAGIC_VERSION = (0xD00D << 16) | 0x0001
_META_WORDS = 136  # header (8) + packed pdf table (128)


def _num_blocks_dyn(sizes: jax.Array) -> jax.Array:
    return -(-sizes.astype(I32) // BLOCK_SIZE)


def _layout(nb: jax.Array):
    """Per-member uint32 section offsets given dynamic block counts."""
    bw_off = _META_WORDS + 32 * nb
    data_off = bw_off + 2 * (((nb + 1) // 2) * 2)
    return bw_off, data_off


def _assemble_archives(
    hdr8: jax.Array,
    pdf: jax.Array,
    states: jax.Array,
    uncomp_w: jax.Array,
    num_words: jax.Array,
    prefix: jax.Array,
    streams32: jax.Array,
    nb: jax.Array,
    total_words: jax.Array,
    out_words: int,
) -> jax.Array:
    """Archive layout via sequential ragged placement.

    Every section is a contiguous run placed at a (possibly dynamic) offset,
    so layout is expressed as ordered block placements (ops.pallas.ragged)
    instead of per-element scatters. Later placements overwrite earlier
    rows' fixed-length zero tails; the static-offset header/pdf rows go
    last, and a final end-mask zeroes each member's tail. Each member's row
    carries MAX_BLOCK_WORDS32 slack so the last block's tail cannot reach
    into the next member's row.
    """
    from ..ops.pallas.ragged import ragged_place

    B, NB = num_words.shape
    K = MAX_BLOCK_WORDS32
    # slack *precedes* each member's content so the previous member's
    # fixed-length stream tails land in slack, never in placed sections
    CWa = out_words + K
    bw_off, data_off = _layout(nb)
    end = data_off + (total_words >> 1)
    row0 = jnp.arange(B, dtype=I32) * CWa + K

    flat = jnp.zeros((B * CWa + K + 8,), U32)
    dump = B * CWa

    # 1. per-block interleaved states (fixed offset 136; tail fixed later)
    flat = ragged_place(states.reshape(B, NB * 32), row0 + _META_WORDS, flat)

    # 2. blockWords pairs at dynamic bw_off
    bw_x = (uncomp_w.astype(U32) << u32(16)) | num_words.astype(U32)
    bw_y = prefix.astype(U32)
    live = jnp.arange(NB, dtype=I32)[None, :] < nb[:, None]
    pairs = jnp.stack(
        [jnp.where(live, bw_x, u32(0)), jnp.where(live, bw_y, u32(0))], axis=2
    ).reshape(B, 2 * NB)
    if NB % 2:
        pairs = jnp.pad(pairs, ((0, 0), (0, 2)))
    flat = ragged_place(pairs, row0 + bw_off, flat)

    # 3. per-block compressed streams at data_off + alignedPrefix
    rows = streams32[:, :, :K].reshape(B * NB, K)
    offs = row0[:, None] + data_off[:, None] + (prefix.astype(I32) >> 1)
    offs = jnp.where(live, offs, dump).reshape(-1)
    flat = ragged_place(rows, offs, flat)

    # 4. header + packed pdf table (static offsets, placed last)
    probs16 = pdf[:, 0::2] | (pdf[:, 1::2] << u32(16))
    flat = ragged_place(
        jnp.concatenate([hdr8, probs16], axis=1), row0, flat
    )

    out = flat[: B * CWa].reshape(B, CWa)[:, K : K + out_words]
    j = jnp.arange(out_words, dtype=I32)[None, :]
    return jnp.where(j < end[:, None], out, u32(0))


def ans_encode_core(
    x_u8: jax.Array,
    sizes: jax.Array,
    prob_bits: int = 10,
    use_checksum: bool = False,
    hist: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Compress batch rows to coalesced ANS archives in uint32 words.

    x_u8: uint8[B, S] row-padded inputs; sizes: int32[B] valid byte counts.
    Returns (out32 uint32[B, CW_tight], comp_bytes uint32[B]).
    """
    B, S = x_u8.shape
    NB = max(1, -(-S // BLOCK_SIZE))
    sizes = sizes.astype(I32)

    if hist is None:
        hist = histogram_batched(x_u8, sizes)
    pdf, cdf, magic, shift = normalize_probs_batched(hist, sizes, prob_bits)

    csum = (
        checksum_batched(x_u8, sizes)
        if use_checksum
        else jnp.zeros((B,), U32)
    )

    pad = NB * BLOCK_SIZE - S
    xp = jnp.pad(x_u8, ((0, 0), (0, pad))) if pad else x_u8

    packed = pack_encode_table(pdf, cdf, shift)
    states, streams32, num_words = encode_blocks(
        xp, sizes, packed, magic, prob_bits
    )

    nb = _num_blocks_dyn(sizes)
    # aligned exclusive prefix of per-block word counts (16B units = 8 words)
    aligned = ((num_words + 7) // 8) * 8
    incl = jnp.cumsum(aligned, axis=1)
    prefix = incl - aligned
    total_words = incl[:, -1].astype(U32)

    blk = jnp.arange(NB, dtype=I32)[None, :]
    uncomp_w = jnp.clip(
        sizes[:, None] - blk * BLOCK_SIZE, 0, BLOCK_SIZE
    ).astype(U32)

    options = u32(prob_bits | (int(use_checksum) << 4))
    hdr8 = jnp.stack(
        [
            jnp.full((B,), _ANS_MAGIC_VERSION, U32),
            nb.astype(U32),
            sizes.astype(U32),
            total_words,
            jnp.broadcast_to(options, (B,)),
            csum,
            jnp.zeros((B,), U32),
            jnp.zeros((B,), U32),
        ],
        axis=1,
    )

    _, data_off = _layout(nb)
    comp_bytes = (4 * data_off + 2 * total_words.astype(I32)).astype(U32)

    # tight buffer: metadata + fully incompressible streams for NB blocks
    tight_need = (
        4 * _META_WORDS + 128 * NB + 8 * ((NB + 1) // 2 * 2)
        + 4 * MAX_BLOCK_WORDS32 * NB
    )
    tight = min(max_compressed_size(S), -(-tight_need // 16) * 16)
    out32 = _assemble_archives(
        hdr8, pdf, states, uncomp_w, num_words, prefix, streams32, nb,
        total_words.astype(I32), tight // 4,
    )
    return out32, comp_bytes


def ans_encode_padded(
    x_u8: jax.Array,
    sizes: jax.Array,
    prob_bits: int = 10,
    use_checksum: bool = False,
    hist: Optional[jax.Array] = None,
    out_bytes: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Byte-row wrapper around ans_encode_core with the reference's
    ``max_compressed_size`` output-buffer contract (zero padded)."""
    S = x_u8.shape[1]
    out32, comp_bytes = ans_encode_core(x_u8, sizes, prob_bits, use_checksum, hist)
    comp = bitcast_u32_to_u8(out32)
    cb = out_bytes if out_bytes is not None else max_compressed_size(S)
    if comp.shape[1] < cb:
        comp = jnp.pad(comp, ((0, 0), (0, cb - comp.shape[1])))
    return comp, comp_bytes


def ans_decode_core(
    comp32: jax.Array,
    base32: jax.Array,
    out_capacity: int,
    prob_bits: int = 10,
    capacities: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Decode ANS archives located at per-member uint32 offsets ``base32``
    within the rows of ``comp32`` (the float codec places its ANS segments at
    dynamic offsets past headers and raw sections).

    Returns (out uint8[B, out_capacity], success bool[B], sizes uint32[B],
    archive_checksum uint32[B]). Mirrors ansDecodeKernel's capacity check:
    members whose decoded size exceeds capacity fail and report the required
    size (GpuANSDecode.cuh:326-337).
    """
    B, CW = comp32.shape
    NB = max(1, -(-out_capacity // BLOCK_SIZE))
    base32 = base32.astype(I32)

    def row_gather(idx):
        idx = jnp.clip(base32.reshape(B, *([1] * (idx.ndim - 1))) + idx, 0, CW - 1)
        return jnp.take_along_axis(comp32, idx.reshape(B, -1), axis=1).reshape(
            idx.shape
        )

    hdr = row_gather(jnp.broadcast_to(jnp.arange(8, dtype=I32), (B, 8)))
    nb_arch = hdr[:, 1].astype(I32)
    n = hdr[:, 2].astype(I32)
    csum = hdr[:, 5]

    if capacities is None:
        capacities = jnp.full((B,), out_capacity, I32)
    success = n <= capacities.astype(I32)

    # unpack pdf table
    pw = row_gather(jnp.broadcast_to(8 + jnp.arange(128, dtype=I32), (B, 128)))
    pdf = jnp.stack([pw & u32(0xFFFF), pw >> u32(16)], axis=2).reshape(
        B, NUM_SYMBOLS
    )
    lut = build_decode_table_batched(pdf, prob_bits)

    # decodable blocks: those that fit the output buffer
    nb = jnp.minimum(nb_arch, NB)
    blk = jnp.arange(NB, dtype=I32)[None, :]
    live = (blk < nb[:, None]) & success[:, None]

    st_idx = _META_WORDS + blk[:, :, None] * 32 + jnp.arange(32, dtype=I32)
    states = row_gather(jnp.broadcast_to(st_idx, (B, NB, 32)))

    bw_off, data_off = _layout(nb_arch)
    bx = row_gather(bw_off[:, None] + 2 * blk)
    by = row_gather(bw_off[:, None] + 2 * blk + 1)
    uncomp_w = jnp.where(live, (bx >> u32(16)).astype(I32), 0)
    comp_w = jnp.where(live, (bx & u32(0xFFFF)).astype(I32), 0)
    starts = jnp.where(live, by.astype(I32), 0)

    # stage each block's compressed words into a dense (B, NB, SW) buffer
    # (per-block starts are 16B aligned, so uint16 word k of a block lives at
    # staged word k>>1, half k&1)
    from ..ops.pallas.ragged import ragged_extract

    SW = MAX_BLOCK_WORDS32 + 8
    abs_off = (
        (jnp.arange(B, dtype=I32) * CW + base32 + data_off)[:, None]
        + (starts >> 1)
    ).reshape(-1)
    flat = jnp.concatenate([comp32.reshape(-1), jnp.zeros((SW + 8,), U32)])
    streams32 = ragged_extract(flat, abs_off, rows=B * NB, width=SW).reshape(
        B, NB, SW
    )

    out_blocks = decode_blocks(
        streams32, comp_w, uncomp_w, states, lut, prob_bits
    )
    out = out_blocks.reshape(B, NB * BLOCK_SIZE)[:, :out_capacity]
    pos = jnp.arange(out_capacity, dtype=I32)[None, :]
    out = jnp.where(
        (pos < n[:, None]) & success[:, None], out, jnp.uint8(0)
    )
    return out, success, n.astype(U32), csum


def ans_decode_padded(
    comp_u8: jax.Array,
    out_capacity: int,
    prob_bits: int = 10,
    capacities: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Byte-row wrapper around ans_decode_core (archives at row starts)."""
    B = comp_u8.shape[0]
    comp32 = bitcast_u8_to_u32(comp_u8)
    return ans_decode_core(
        comp32, jnp.zeros((B,), I32), out_capacity, prob_bits, capacities
    )


def ans_get_compressed_info(comp_u8: jax.Array):
    """Read sizes and stored checksums from archive headers
    (reference: GpuANSInfo.cuh:16-37)."""
    comp32 = bitcast_u8_to_u32(comp_u8[:, :32])
    return comp32[:, 2], comp32[:, 5]
