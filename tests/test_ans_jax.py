"""JAX ANS codec vs the NumPy oracle: byte-exact archives and round-trips.

This is the strongest form of the reference's ans_test coverage
(ans/ANSTest.cu:243-282): instead of only asserting round-trip equality, the
device codec's archives must match the oracle byte-for-byte.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core import reference as R
from dietgpu_fork_tpu.models import ans as A
from tests.conftest import make_exponential_bytes

enc = jax.jit(A.ans_encode_padded, static_argnames=("prob_bits", "use_checksum"))
dec = jax.jit(A.ans_decode_padded, static_argnames=("out_capacity", "prob_bits"))


def run_batch(rng, batch_sizes, S, lam=10.0, pb=10, cks=True):
    B = len(batch_sizes)
    x = np.zeros((B, S), np.uint8)
    datas = []
    for i, n in enumerate(batch_sizes):
        d = make_exponential_bytes(rng, n, lam)
        x[i, :n] = d
        datas.append(d)
    sizes = np.array(batch_sizes, np.int32)
    comp, comp_bytes = enc(
        jnp.array(x), jnp.array(sizes), prob_bits=pb, use_checksum=cks
    )
    comp = np.asarray(comp)
    comp_bytes = np.asarray(comp_bytes)

    for i, d in enumerate(datas):
        arc = R.ans_encode(d, prob_bits=pb, use_checksum=cks)
        assert comp_bytes[i] == arc.size
        assert np.array_equal(comp[i, : arc.size], arc), f"member {i}"

    out, success, sizes_out, _ = dec(
        jnp.array(comp), out_capacity=S, prob_bits=pb
    )
    out = np.asarray(out)
    assert np.all(np.asarray(success))
    for i, d in enumerate(datas):
        assert np.asarray(sizes_out)[i] == d.size
        assert np.array_equal(out[i, : d.size], d)


@pytest.mark.parametrize("pb", [9, 10, 11])
@pytest.mark.parametrize("lam", [1.0, 100.0])
def test_byte_exact_sharpness(rng, pb, lam):
    run_batch(rng, [5000, 20000], 20000, lam=lam, pb=pb)


def test_byte_exact_block_edges(rng):
    run_batch(rng, [4095, 4096, 4097, 1, 8192], 8192)


def test_byte_exact_empty_member(rng):
    run_batch(rng, [0, 5000, 12288], 12288, pb=9)


def test_byte_exact_random_batch(rng):
    run_batch(rng, list(rng.integers(1, 20000, 8)), 20000)


def test_capacity_failure_reports_required_size(rng):
    x = rng.integers(0, 256, (1, 8192), np.uint8)
    comp, _ = enc(
        jnp.array(x), jnp.array([8192], np.int32), prob_bits=10,
        use_checksum=False,
    )
    out, success, sizes_out, _ = dec(
        jnp.array(comp), out_capacity=4096, prob_bits=10
    )
    assert not bool(success[0])
    assert int(sizes_out[0]) == 8192
    assert not np.any(np.asarray(out))  # failed members produce zeros


def test_incompressible_data_fits_bound(rng):
    # uniform random bytes: worst-case expansion must stay within
    # max_compressed_size (mirrors the encoder's internal assert,
    # GpuANSEncode.cuh:356-361)
    from dietgpu_fork_tpu.core.constants import max_compressed_size

    x = rng.integers(0, 256, (1, 65536), np.uint8)
    comp, comp_bytes = enc(
        jnp.array(x), jnp.array([65536], np.int32), prob_bits=10,
        use_checksum=False,
    )
    assert int(comp_bytes[0]) <= max_compressed_size(65536)
    out, success, _, _ = dec(jnp.array(comp), out_capacity=65536, prob_bits=10)
    assert bool(success[0])
    assert np.array_equal(np.asarray(out), x)


def test_info(rng):
    x = rng.integers(0, 256, (2, 4096), np.uint8)
    comp, _ = enc(
        jnp.array(x), jnp.array([4096, 100], np.int32), prob_bits=10,
        use_checksum=True,
    )
    sizes, csums = A.ans_get_compressed_info(comp)
    assert int(sizes[0]) == 4096 and int(sizes[1]) == 100
    assert int(csums[0]) == R.checksum(x[0])
    assert int(csums[1]) == R.checksum(x[1, :100])


def test_ranked_decode_tables_match_packed_lut(rng):
    """The rank-permuted tables must agree with the packed LUT after
    undoing the rank permutation, for every prob_bits, and the `big` flag
    must reflect whether any member has > 128 distinct symbols."""
    import jax.numpy as jnp
    from dietgpu_fork_tpu.ops.table import (
        build_decode_table_batched,
        build_decode_tables_ranked,
        normalize_probs_batched,
    )

    for pb, nsym in ((9, 256), (10, 256), (11, 256), (10, 90)):
        c = rng.integers(0, 1000, (3, 256), dtype=np.int64)
        c[:, nsym:] = 0  # nsym <= 128 distinct symbols -> big == 0
        counts = jnp.asarray(c.astype(np.uint32))
        totals = counts.astype(np.int32).sum(axis=1)
        pdf, _, _, _ = normalize_probs_batched(counts, totals, pb)
        lut = np.asarray(build_decode_table_batched(pdf, pb))
        rank4, rtab, big = (
            np.asarray(x) for x in build_decode_tables_ranked(pdf, pb)
        )
        nnz = int((np.asarray(pdf) > 0).sum(axis=1).max())
        assert int(big[0, 0]) == int(nnz > 128), (pb, nsym)
        nb = 1 << pb
        slots = np.arange(nb)
        rk = (rank4[:, slots >> 2] >> ((slots & 3) * 8)) & 0xFF
        e = rtab[np.arange(3)[:, None], rk]
        sym = e & 0xFF
        cdf_v = (e >> 8) & 0x7FF
        pdf_v = e >> 19
        assert np.array_equal(sym, lut & 0xFF), (pb, nsym)
        assert np.array_equal(pdf_v, (lut >> 8) & 0xFFF), (pb, nsym)
        assert np.array_equal(
            (slots[None, :] - cdf_v) & 0xFFFFFFFF, lut >> 20
        ), (pb, nsym)


def test_split_decode_tables_match_packed_lut(rng):
    """The TPU decoder's two-level tables must agree with the packed LUT
    (slot -> (sym, pdf, smc)) for every prob_bits."""
    import jax.numpy as jnp
    from dietgpu_fork_tpu.ops.table import (
        build_decode_table_batched,
        build_decode_tables_split,
        normalize_probs_batched,
    )

    for pb in (9, 10, 11):
        counts = jnp.asarray(
            rng.integers(0, 1000, (3, 256), dtype=np.int64).astype(np.uint32)
        )
        totals = counts.astype(np.int32).sum(axis=1)
        pdf, _, _, _ = normalize_probs_batched(counts, totals, pb)
        lut = np.asarray(build_decode_table_batched(pdf, pb))
        sym4, symtab = (np.asarray(x) for x in build_decode_tables_split(pdf, pb))
        nb = 1 << pb
        slots = np.arange(nb)
        sym = (sym4[:, slots >> 2] >> ((slots & 3) * 8)) & 0xFF
        want_sym = lut & 0xFF
        assert np.array_equal(sym, want_sym)
        e = symtab[np.arange(3)[:, None], sym]
        pdf_v = e & 0xFFFF
        cdf_v = e >> 16
        assert np.array_equal(pdf_v, (lut >> 8) & 0xFFF)
        # smc = slot - cdf[sym] must equal the packed LUT's smc field
        assert np.array_equal(
            (slots[None, :] - cdf_v) & 0xFFFFFFFF, lut >> 20
        )
