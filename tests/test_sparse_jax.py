"""JAX sparse float codec vs oracle: byte-exact archives + round trips
(coverage model: float/SparseFloatBenchmark.cu round-trip assertions — the
reference has no dedicated sparse gtest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core import reference as R
from dietgpu_fork_tpu.core.constants import FLOAT_WORD_SIZE, FloatType
from dietgpu_fork_tpu.models import sparse as SP
from tests.conftest import make_float_words
from tests.test_float_jax import ALL_FT, pack_rows

enc = jax.jit(
    SP.sparse_float_compress_core,
    static_argnames=("float_type", "prob_bits", "use_checksum"),
)
dec = jax.jit(
    SP.sparse_float_decompress_core,
    static_argnames=(
        "out_floats", "float_type", "prob_bits", "verify_checksum"
    ),
)


def sparse_words(rng, ft, n, sparsity):
    w = make_float_words(rng, ft, n)
    return np.where(rng.random(n) < sparsity, np.zeros_like(w), w)


@pytest.mark.parametrize("ft", ALL_FT)
@pytest.mark.parametrize("sparsity", [0.0, 0.5, 1.0])
def test_sparse_byte_exact(rng, ft, sparsity):
    sizes = [1000, 1, 4097]
    S_cap = max(sizes)
    words = [sparse_words(rng, ft, n, sparsity) for n in sizes]
    d32 = pack_rows(words, S_cap, ft)
    n = jnp.array(sizes, jnp.int32)
    comp32, cbytes = enc(
        jnp.array(d32), n, float_type=ft, prob_bits=9, use_checksum=True
    )
    comp_u8 = np.asarray(comp32).view(np.uint8)
    cbytes = np.asarray(cbytes)
    for i, w in enumerate(words):
        arc = R.sparse_float_compress(w, ft, prob_bits=9, use_checksum=True)
        assert cbytes[i] == arc.size
        assert np.array_equal(comp_u8[i, : arc.size], arc), f"member {i}"

    out32, success, nn, ca, cg = dec(
        jnp.array(np.asarray(comp32)), out_floats=S_cap, float_type=ft,
        prob_bits=9, verify_checksum=True,
    )
    assert np.all(np.asarray(success))
    assert np.array_equal(np.asarray(ca), np.asarray(cg))
    out_u8 = np.asarray(out32).view(np.uint8)
    for i, w in enumerate(words):
        assert np.array_equal(out_u8[i, : w.nbytes], w.view(np.uint8))


def test_sparse_tail_edge_cases(rng):
    # the tails the reference's scan special-case mishandles
    ft = FloatType.FLOAT32
    for tail in ([0, 0], [0, 1], [1, 0], [1, 1]):
        w = sparse_words(rng, ft, 130, 0.5)
        w[-2:] = np.where(np.array(tail) == 0, 0, np.maximum(w[-2:], 1))
        d32 = pack_rows([w], 130, ft)
        comp32, _ = enc(
            jnp.array(d32), jnp.array([130], jnp.int32), float_type=ft,
            prob_bits=10, use_checksum=False,
        )
        arc = R.sparse_float_compress(w, ft, prob_bits=10)
        assert np.array_equal(
            np.asarray(comp32).view(np.uint8)[0, : arc.size], arc
        )
        out32, success, _, _, _ = dec(
            jnp.array(np.asarray(comp32)), out_floats=130, float_type=ft,
            prob_bits=10,
        )
        assert bool(success[0])
        assert np.array_equal(
            np.asarray(out32).view(np.uint8)[0, : w.nbytes], w.view(np.uint8)
        )


def test_sparse_compression_beats_dense_on_sparse_data(rng):
    from dietgpu_fork_tpu.models import float_codec as F

    ft = FloatType.FLOAT32
    w = sparse_words(rng, ft, 50000, 0.9)
    d32 = pack_rows([w], 50000, ft)
    n = jnp.array([50000], jnp.int32)
    _, sp_bytes = enc(
        jnp.array(d32), n, float_type=ft, prob_bits=10, use_checksum=False
    )
    _, dn_bytes = jax.jit(
        F.float_compress_core,
        static_argnames=("float_type", "prob_bits", "use_checksum"),
    )(jnp.array(d32), n, float_type=ft, prob_bits=10, use_checksum=False)
    assert int(sp_bytes[0]) < int(dn_bytes[0])
