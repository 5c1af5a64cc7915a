"""JAX float codec vs oracle: byte-exact archives + round trips for all four
float types (coverage model: float/FloatTest.cu:287-341)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core import reference as R
from dietgpu_fork_tpu.core.constants import FLOAT_WORD_SIZE, FloatType
from dietgpu_fork_tpu.models import float_codec as F
from tests.conftest import make_float_words

ALL_FT = [FloatType.FLOAT16, FloatType.BFLOAT16, FloatType.FLOAT32,
          FloatType.FLOAT64]

enc = jax.jit(
    F.float_compress_core,
    static_argnames=("float_type", "prob_bits", "use_checksum", "native"),
)
dec = jax.jit(
    F.float_decompress_core,
    static_argnames=(
        "out_floats", "float_type", "prob_bits", "verify_checksum", "native"
    ),
)


def pack_rows(words_list, S_cap, ft):
    ws = FLOAT_WORD_SIZE[ft]
    W32 = -(-(S_cap * ws) // 4)
    buf = np.zeros((len(words_list), W32 * 4), np.uint8)
    for i, w in enumerate(words_list):
        buf[i, : w.nbytes] = w.view(np.uint8)
    return buf.view(np.uint32)


def run(rng, ft, sizes, pb=10, cks=True):
    S_cap = max(max(sizes), 1)
    words = [make_float_words(rng, ft, n) for n in sizes]
    d32 = pack_rows(words, S_cap, ft)
    n = jnp.array(sizes, jnp.int32)
    comp32, cbytes = enc(
        jnp.array(d32), n, float_type=ft, prob_bits=pb, use_checksum=cks
    )
    comp_u8 = np.asarray(comp32).view(np.uint8)
    cbytes = np.asarray(cbytes)
    for i, w in enumerate(words):
        arc = R.float_compress(w, ft, prob_bits=pb, use_checksum=cks)
        assert cbytes[i] == arc.size
        assert np.array_equal(comp_u8[i, : arc.size], arc), f"member {i}"

    out32, success, nn, ca, cg = dec(
        jnp.array(np.asarray(comp32)),
        jnp.zeros((len(sizes),), jnp.int32),
        out_floats=S_cap,
        float_type=ft,
        prob_bits=pb,
        verify_checksum=cks,
    )
    assert np.all(np.asarray(success))
    if cks:
        assert np.array_equal(np.asarray(ca), np.asarray(cg))
    ws = FLOAT_WORD_SIZE[ft]
    out_u8 = np.asarray(out32).view(np.uint8)
    for i, w in enumerate(words):
        assert np.array_equal(out_u8[i, : w.nbytes], w.view(np.uint8))


@pytest.mark.parametrize("ft", ALL_FT)
@pytest.mark.parametrize("pb", [9, 10])
def test_float_byte_exact(rng, ft, pb):
    run(rng, ft, [1000, 1, 4096], pb=pb)


@pytest.mark.parametrize("ft", ALL_FT)
def test_float_edges_and_empty(rng, ft):
    run(rng, ft, [0, 7, 4097, 5000])


def test_float_info(rng):
    ft = FloatType.BFLOAT16
    words = [make_float_words(rng, ft, 300)]
    d32 = pack_rows(words, 300, ft)
    comp, cbytes = F.float_compress_padded(
        jnp.array(d32), jnp.array([300], jnp.int32), ft, use_checksum=True
    )
    sizes, types, csums = F.float_get_compressed_info(comp)
    assert int(sizes[0]) == 300
    assert int(types[0]) == int(ft)
    assert int(csums[0]) == R.checksum(words[0].view(np.uint8))


def test_float_capacity_failure(rng):
    ft = FloatType.FLOAT32
    words = [make_float_words(rng, ft, 5000)]
    d32 = pack_rows(words, 5000, ft)
    comp32, _ = enc(
        jnp.array(d32), jnp.array([5000], jnp.int32), float_type=ft,
        prob_bits=10, use_checksum=False,
    )
    out32, success, nn, _, _ = dec(
        jnp.array(np.asarray(comp32)), jnp.zeros((1,), jnp.int32),
        out_floats=4096, float_type=ft, prob_bits=10,
    )
    assert not bool(success[0])
    assert int(nn[0]) == 5000


def test_native_aligned_v2_layout(rng):
    """Native archives with >= FLOAT_ALIGN_MIN floats use the v2 container
    (512B-aligned raw sections, float version 2) — byte-exact vs the
    oracle, self-describing, round-trips; smaller members stay v1 in the
    SAME batch (the layout is per-member)."""
    from dietgpu_fork_tpu.core.constants import FLOAT_ALIGN_MIN
    from dietgpu_fork_tpu.core.format import FloatHeader

    ft = FloatType.BFLOAT16
    big, small = FLOAT_ALIGN_MIN + 100, FLOAT_ALIGN_MIN - 64
    sizes = [big, small]
    words = [make_float_words(rng, ft, n) for n in sizes]
    d32 = pack_rows(words, big, ft)
    comp32, cbytes = enc(
        jnp.array(d32), jnp.array(sizes, jnp.int32), float_type=ft,
        prob_bits=10, use_checksum=True, native=True,
    )
    comp_u8 = np.asarray(comp32).view(np.uint8)
    cbytes = np.asarray(cbytes)
    for i, w in enumerate(words):
        arc = R.float_compress(
            w, ft, prob_bits=10, use_checksum=True, native=True
        )
        hdr = FloatHeader.unpack(arc[:32].view(np.uint32))
        assert hdr.aligned == (sizes[i] >= FLOAT_ALIGN_MIN)
        assert cbytes[i] == arc.size
        assert np.array_equal(comp_u8[i, : arc.size], arc), f"member {i}"
        # oracle decodes the device archive (cross-check both dirs)
        got, _ = R.float_decompress(comp_u8[i, : cbytes[i]])
        assert np.array_equal(got.view(np.uint8), w.view(np.uint8))

    out32, success, nn, ca, cg = dec(
        jnp.array(np.asarray(comp32)), jnp.zeros((2,), jnp.int32),
        out_floats=big, float_type=ft, prob_bits=10, verify_checksum=True,
        native=True,
    )
    assert np.all(np.asarray(success))
    assert np.array_equal(np.asarray(ca), np.asarray(cg))
    out_u8 = np.asarray(out32).view(np.uint8)
    for i, w in enumerate(words):
        assert np.array_equal(out_u8[i, : w.nbytes], w.view(np.uint8))


@pytest.mark.parametrize(
    "ft", [FloatType.FLOAT32, FloatType.FLOAT64]
)
def test_native_aligned_v2_two_sections(rng, ft):
    """v2 alignment for the two-raw-section types (fp32/fp64), incl. the
    fp64 double-ANS-segment layout."""
    from dietgpu_fork_tpu.core.constants import FLOAT_ALIGN_MIN

    n = FLOAT_ALIGN_MIN + 13
    w = make_float_words(rng, ft, n)
    d32 = pack_rows([w], n, ft)
    comp32, cbytes = enc(
        jnp.array(d32), jnp.array([n], jnp.int32), float_type=ft,
        prob_bits=10, use_checksum=True, native=True,
    )
    arc = R.float_compress(w, ft, prob_bits=10, use_checksum=True,
                           native=True)
    cb = int(np.asarray(cbytes)[0])
    assert cb == arc.size
    assert np.array_equal(
        np.asarray(comp32).view(np.uint8)[0, : arc.size], arc
    )
    out32, success, *_ = dec(
        jnp.array(np.asarray(comp32)), jnp.zeros((1,), jnp.int32),
        out_floats=n, float_type=ft, prob_bits=10, native=True,
    )
    assert bool(np.asarray(success)[0])
    assert np.array_equal(
        np.asarray(out32).view(np.uint8)[0, : w.nbytes], w.view(np.uint8)
    )
