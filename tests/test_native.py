"""Native host codec (C++/ctypes) vs the NumPy oracle: byte-exact archives."""

import shutil

import numpy as np
import pytest

from dietgpu_fork_tpu.core import reference as R
from dietgpu_fork_tpu.core.constants import FloatType
from tests.conftest import make_exponential_bytes, make_float_words

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def nc():
    from dietgpu_fork_tpu.runtime import native_codec

    native_codec._load()
    return native_codec


@pytest.mark.parametrize("n", [1, 100, 4095, 4097, 100000])
def test_native_ans_byte_exact(rng, nc, n):
    d = make_exponential_bytes(rng, n, 10.0)
    assert np.array_equal(
        nc.ans_encode(d, 10, True), R.ans_encode(d, 10, True)
    )
    assert np.array_equal(nc.ans_decode(nc.ans_encode(d, 10, True)), d)


@pytest.mark.parametrize(
    "ft",
    [FloatType.FLOAT16, FloatType.BFLOAT16, FloatType.FLOAT32,
     FloatType.FLOAT64],
)
def test_native_float_byte_exact(rng, nc, ft):
    for n in (1, 1000, 4097):
        w = make_float_words(rng, ft, n)
        a1 = nc.float_compress(w, ft, 10, True)
        assert np.array_equal(a1, R.float_compress(w, ft, 10, True))
        out, ft2 = nc.float_decompress(a1)
        assert ft2 == ft
        assert np.array_equal(out.view(np.uint8), w.view(np.uint8))


def test_native_batch(rng, nc):
    ft = FloatType.BFLOAT16
    sizes = np.array([1000, 1, 5000], np.uint32)
    S = int(sizes.max())
    rows = np.zeros((3, S * 2), np.uint8)
    words = []
    for i, n in enumerate(sizes):
        w = make_float_words(rng, ft, int(n))
        rows[i, : w.nbytes] = w.view(np.uint8)
        words.append(w)
    comp, comp_sizes = nc.float_compress_batch(rows, sizes, ft, 10, False)
    for i, w in enumerate(words):
        expect = R.float_compress(w, ft, 10, False)
        assert comp_sizes[i] == expect.size
        assert np.array_equal(comp[i, : expect.size], expect)
    out, status, nout = nc.float_decompress_batch(comp, S, ft)
    assert np.all(status == 0)
    for i, w in enumerate(words):
        assert nout[i] == w.size
        assert np.array_equal(out[i, : w.nbytes], w.view(np.uint8))


def test_native_checksum_failure(rng, nc):
    w = make_float_words(rng, FloatType.FLOAT32, 1000)
    arc = nc.float_compress(w, FloatType.FLOAT32, 10, True).copy()
    arc[40] ^= 0xFF
    with pytest.raises(RuntimeError):
        nc.float_decompress(arc)
