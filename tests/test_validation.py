"""Decode-side archive validation fuzz tests.

The reference asserts magic+version on every decode (GpuANSUtils.cuh:109-112),
checks probBits (GpuANSDecode.cuh:323), and the float kernel re-checks the
header and the ANS-reported size (GpuFloatDecompress.cuh:577-587). The JAX
decode path folds those checks into per-member ``success`` instead of
trapping; these tests feed it garbage, truncated, and corrupted archives and
assert nothing ever comes back as success=True.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dietgpu_fork_tpu.api import codec as C
from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.ans import ans_decode_padded
from dietgpu_fork_tpu.models.float_codec import float_decompress_core
from dietgpu_fork_tpu.ops.bitops import bitcast_u8_to_u32


def _ans_archive(rng, n=6000):
    data = rng.integers(0, 64, n, dtype=np.uint8)
    arcs = C.compress_data_simple(False, [data])
    return data, arcs[0]


def _decode_raw(arc_u8, out_capacity, prob_bits=10):
    m = np.zeros((1, -(-arc_u8.size // 4) * 4), np.uint8)
    m[0, : arc_u8.size] = arc_u8
    out, success, n, _ = ans_decode_padded(
        jnp.asarray(m), out_capacity, prob_bits
    )
    return np.asarray(out), bool(np.asarray(success)[0]), int(np.asarray(n)[0])


def test_ans_wrong_magic_fails(rng):
    data, arc = _ans_archive(rng)
    bad = arc.copy()
    bad[0] ^= 0xFF  # corrupt the magic word
    _, ok, n = _decode_raw(bad, data.size)
    assert not ok and n == 0


def test_ans_wrong_version_fails(rng):
    data, arc = _ans_archive(rng)
    bad = arc.copy()
    bad[0] ^= 0x02  # version 1 -> 3
    _, ok, n = _decode_raw(bad, data.size)
    assert not ok and n == 0


def test_ans_prob_bits_mismatch_fails(rng):
    data, arc = _ans_archive(rng)
    _, ok, _ = _decode_raw(arc, data.size, prob_bits=9)
    assert not ok


def test_ans_truncated_archive_fails(rng):
    data, arc = _ans_archive(rng)
    # header intact, payload cut: claimed extent exceeds the buffer row
    _, ok, n = _decode_raw(arc[: arc.size // 2], data.size)
    assert not ok and n == 0


def test_ans_block_count_mismatch_fails(rng):
    data, arc = _ans_archive(rng)
    bad = arc.copy()
    bad[4:8] = np.frombuffer(np.uint32(99).tobytes(), np.uint8)  # numBlocks
    _, ok, _ = _decode_raw(bad, data.size)
    assert not ok


def test_ans_garbage_buffer_fails(rng):
    garbage = rng.integers(0, 256, 4096, dtype=np.uint8)
    _, ok, n = _decode_raw(garbage, 4096)
    assert not ok and n == 0


def test_ans_bitflip_payload_checksum_detects(rng):
    data = rng.integers(0, 64, 6000, dtype=np.uint8)
    comp, comp_bytes, _ = C.compress_data(False, [data], checksum=True)
    comp = np.asarray(comp).copy()
    # flip a byte deep in the compressed stream region (past header+table)
    comp[0, 600] ^= 0x10
    with pytest.raises(RuntimeError, match="checksum"):
        C.decompress_data(False, comp, [data.size], checksum=True)


def _float_archive(rng, n=5000, dtype="float32"):
    data = rng.normal(0, 1, n).astype(dtype)
    arcs = C.compress_data_simple(True, [data])
    return data, arcs[0]


def _float_decode_raw(arc_u8, out_floats, ft, prob_bits=10):
    m = np.zeros((1, -(-arc_u8.size // 4) * 4), np.uint8)
    m[0, : arc_u8.size] = arc_u8
    w, success, n, _, _ = float_decompress_core(
        bitcast_u8_to_u32(jnp.asarray(m)), jnp.zeros((1,), jnp.int32),
        out_floats, ft, prob_bits,
    )
    return bool(np.asarray(success)[0]), int(np.asarray(n)[0])


def test_float_wrong_magic_fails(rng):
    data, arc = _float_archive(rng)
    bad = arc.copy()
    bad[2] ^= 0x01  # magic upper half
    ok, n = _float_decode_raw(bad, data.size, FloatType.FLOAT32)
    assert not ok and n == 0


def test_float_declared_type_mismatch_fails(rng):
    data, arc = _float_archive(rng, dtype="float16")
    ok, _ = _float_decode_raw(arc, data.size, FloatType.BFLOAT16)
    assert not ok


def test_float_truncated_archive_fails(rng):
    data, arc = _float_archive(rng)
    # cut inside the ANS segment: the embedded ANS extent check trips
    ok, _ = _float_decode_raw(arc[: arc.size - arc.size // 4],
                              data.size, FloatType.FLOAT32)
    assert not ok


def test_float_garbage_buffer_fails(rng):
    garbage = rng.integers(0, 256, 8192, dtype=np.uint8)
    ok, n = _float_decode_raw(garbage, 2048, FloatType.FLOAT32)
    assert not ok and n == 0


def test_float_bitflip_payload_checksum_detects(rng):
    data = rng.normal(0, 1, 6000).astype(np.float32)
    comp, comp_bytes, _ = C.compress_data(True, [data], checksum=True)
    comp = np.asarray(comp).copy()
    comp[0, int(np.asarray(comp_bytes)[0]) - 100] ^= 0x04
    with pytest.raises(RuntimeError, match="checksum"):
        C.decompress_data(
            True, comp, [data.size], dtype=np.float32, checksum=True
        )


def test_sparse_garbage_buffer_fails(rng):
    garbage = rng.integers(0, 256, 8192, dtype=np.uint8).reshape(1, -1)
    outs = None
    from dietgpu_fork_tpu.models.sparse import sparse_float_decompress_core

    w, ok, n, _, _ = sparse_float_decompress_core(
        bitcast_u8_to_u32(jnp.asarray(garbage)), 2048, FloatType.FLOAT32
    )
    assert not bool(np.asarray(ok)[0])


def test_capacity_failure_still_reports_required_size(rng):
    # a VALID archive that merely exceeds capacity must keep reporting the
    # required size (GpuANSDecode.cuh:326-337) — validation must not eat it
    data, arc = _ans_archive(rng, n=9000)
    _, ok, n = _decode_raw(arc, 4096)
    assert not ok and n == 9000
