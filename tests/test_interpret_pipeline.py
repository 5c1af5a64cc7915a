"""Interpret-mode pipeline tests: run the FULL TPU code path (Pallas
flat-cell kernels, end-aligned staging, fused decode+join) on CPU via
``DIETTPU_INTERPRET=1`` and assert exact round-trips.

The default CPU suite exercises the portable XLA fallbacks; these tests
cover the Pallas kernel *semantics* (per-row tables, member-flattened
block space, fused joins) without a chip. Mosaic lowering itself is only
checked by tests/test_tpu_kernels.py on real hardware.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import dietgpu_fork_tpu.api.codec as C


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("DIETTPU_INTERPRET", "1")


@pytest.fixture
def rng():
    return np.random.default_rng(0x1C0DE)


def _roundtrip_float(rng, dtype, sizes, sparse=False):
    ts = []
    for n in sizes:
        t = rng.standard_normal(n).astype(dtype)
        if sparse:
            t[rng.random(n) < 0.9] = 0
        ts.append(t)
    comp, _, _ = C.compress_data(True, ts, checksum=True, sparse=sparse)
    outs, _, succ, _, _ = C.decompress_data(
        True, comp, [t.size for t in ts], dtype=dtype, checksum=True,
        sparse=sparse,
    )
    assert all(bool(s) for s in np.asarray(succ))
    for o, t in zip(outs, ts):
        assert np.array_equal(np.asarray(o), t)


def test_fused16_ragged_batch(rng):
    # ragged members: flat cells span members, incl. a 1-element row
    _roundtrip_float(rng, np.float16, [5000, 1, 21000])


def test_fused16_uniform_batch(rng):
    # uniform members (the bs=128 regime scaled down): every member is
    # NB=2 blocks, so kernel rows alternate members within one cell
    _roundtrip_float(rng, "bfloat16", [8192] * 6)


def test_fp32_sections(rng):
    _roundtrip_float(rng, np.float32, [13000, 100])


def test_fp32_fused_join(rng, monkeypatch):
    # fused decode+join for fp32 (tile-epilogue join); gated by default
    import dietgpu_fork_tpu.models.float_codec as FC

    monkeypatch.setattr(FC, "_FUSED_F32", True)
    _roundtrip_float(rng, np.float32, [20000])
    _roundtrip_float(rng, np.float32, [4096] * 4)


def test_fp64_two_planes(rng):
    _roundtrip_float(rng, np.float64, [9000, 5])


def test_raw_ans(rng):
    ts = [rng.integers(0, 40, n).astype(np.uint8) for n in (10000, 3)]
    comp, _, _ = C.compress_data(False, ts, checksum=True)
    outs, _, succ, _, _ = C.decompress_data(
        False, comp, [t.size for t in ts], dtype=np.uint8, checksum=True
    )
    assert all(bool(s) for s in np.asarray(succ))
    for o, t in zip(outs, ts):
        assert np.array_equal(np.asarray(o), t)


@pytest.mark.parametrize("dtype", [np.float16, np.float32, np.float64])
def test_sparse(rng, dtype):
    # fp32/fp64 exercise pack_bitmap32_tpu / pack_bitmap64_tpu and the
    # wide-word compact/expand paths in interpret mode
    _roundtrip_float(rng, dtype, [16000], sparse=True)
