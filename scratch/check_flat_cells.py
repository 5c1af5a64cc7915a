"""Interpret-mode validation of the flat-cells batched kernels (encoder
phase A+B, decoder) against the portable CPU ops.

Runs on CPU via pallas interpret=True — validates semantics (per-row
tables, member-flattened block space), not Mosaic lowering.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scratch/check_flat_cells.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import BLOCK_SIZE
from dietgpu_fork_tpu.ops.bitops import bitcast_u8_to_u32
from dietgpu_fork_tpu.ops.checksum import mask_packed_bytes
from dietgpu_fork_tpu.ops.histogram import histogram_packed
from dietgpu_fork_tpu.ops.table import (
    normalize_probs_batched,
    pack_encode_table,
)
from dietgpu_fork_tpu.ops.rans_encode import encode_blocks
from dietgpu_fork_tpu.ops.pallas.rans_encode_fused import encode_blocks_fused

I32 = jnp.int32


def make_batch(rng, B, S, ragged=True):
    sizes = np.full(B, S, np.int32)
    if ragged:
        sizes = rng.integers(S // 3, S + 1, B).astype(np.int32)
        sizes[0] = S
    x = rng.integers(0, 64, (B, S), dtype=np.uint8)
    for b in range(B):
        x[b, sizes[b]:] = 0
    return x, sizes


def run_case(B, S, prob_bits=10, seed=0):
    rng = np.random.default_rng(seed)
    x, sizes = make_batch(rng, B, S)
    NB = -(-S // BLOCK_SIZE)
    pad_w = NB * (BLOCK_SIZE // 4)
    x32 = mask_packed_bytes(
        bitcast_u8_to_u32(jnp.asarray(
            np.pad(x, ((0, 0), (0, NB * BLOCK_SIZE - S))))),
        jnp.asarray(sizes),
    )
    hist = histogram_packed(x32, jnp.asarray(sizes))
    pdf, cdf, magic, shift = normalize_probs_batched(
        hist, jnp.asarray(sizes), prob_bits)
    packed = pack_encode_table(pdf, cdf, shift)

    # portable reference (CPU backend -> scan path)
    st_ref, str_ref, nw_ref = encode_blocks(
        x32, jnp.asarray(sizes), packed, magic, prob_bits)

    # flat-cells pallas path, interpret mode
    st_p, str_p, nw_p = encode_blocks_fused(
        x32, jnp.asarray(sizes), packed, magic, prob_bits, interpret=True)

    nw_ref = np.asarray(nw_ref)
    nw_p = np.asarray(nw_p)
    assert np.array_equal(nw_ref, nw_p), (
        f"num_words mismatch B={B} S={S}: {nw_ref} vs {nw_p}")
    assert np.array_equal(np.asarray(st_ref), np.asarray(st_p)), (
        f"states mismatch B={B} S={S}")
    # streams: compare the valid u16 words per block (strides differ)
    sr = np.asarray(str_ref).view(np.uint16).reshape(B, NB, -1)
    sp = np.asarray(str_p).view(np.uint16).reshape(B, NB, -1)
    for b in range(B):
        for nb in range(NB):
            k = nw_ref[b, nb]
            assert np.array_equal(sr[b, nb, :k], sp[b, nb, :k]), (
                f"stream mismatch b={b} nb={nb} B={B} S={S}")
    print(f"encoder OK  B={B:3d} S={S:6d} NB={NB}")


if __name__ == "__main__":
    run_case(1, 4096)          # single block
    run_case(1, 40000)         # NB=10 (pads to 12 rows-of-4)
    run_case(3, 12000)         # NB=3 -> NB4=4, cells span members
    run_case(8, 8192)          # NB=2 -> NB4=4
    run_case(16, 16384)        # NB=4, 16 members in shared cells
    run_case(5, 50000, seed=3) # ragged mixed
    print("ALL ENCODER FLAT-CELL CHECKS PASSED")
