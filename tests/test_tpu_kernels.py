"""TPU-only kernel tests: exercised when the suite runs on a real chip
(`JAX_PLATFORMS= pytest tests/test_tpu_kernels.py`); skipped under the
CPU-pinned default suite. Each Pallas kernel is checked against its
portable jnp reference on randomized shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a TPU backend"
)


@pytest.fixture
def rng():
    return np.random.default_rng(0xBEEF)


def test_runs_merge_matches_reference(rng):
    from dietgpu_fork_tpu.ops.pallas.merge import (
        _runs_merge_ref,
        _runs_merge_tpu2,
    )

    src = jnp.asarray(
        rng.integers(0, 2**32, 1 << 20, dtype=np.uint64).astype(np.uint32)
    )
    lens = (rng.integers(0, 300, 500) * 4).astype(np.int32)
    lens[7] = 40000  # long-piece class
    lens[8] = 2000
    dst = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
    srco = (rng.integers(0, 1 << 17, 500) * 4).astype(np.int32)
    out_len = int(dst[-1] + lens[-1]) + 12
    a = _runs_merge_tpu2(
        src, jnp.asarray(dst), jnp.asarray(srco), jnp.asarray(lens),
        out_len=out_len,
    )
    b = _runs_merge_ref(
        src, jnp.asarray(dst), jnp.asarray(srco), jnp.asarray(lens),
        out_len=out_len,
    )
    assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("ftname", ["FLOAT16", "BFLOAT16", "FLOAT32", "FLOAT64"])
def test_split_join_fused_roundtrip(rng, ftname):
    from dietgpu_fork_tpu.core.constants import FloatType
    from dietgpu_fork_tpu.ops.pallas.float_split_fused import (
        join_packed_tpu,
        split_packed_tpu,
    )

    ft = FloatType[ftname]
    req = {"FLOAT16": 2, "BFLOAT16": 2, "FLOAT32": 4, "FLOAT64": 8}[ftname]
    W = 4096 * req
    d = jnp.asarray(
        rng.integers(0, 2**32, (3, W), dtype=np.uint64).astype(np.uint32)
    )
    cp, nc = split_packed_tpu(d, ft)
    out = join_packed_tpu(cp, nc, ft)
    assert np.array_equal(np.asarray(out), np.asarray(d))


def test_histogram_mxu_packed_exact(rng):
    from dietgpu_fork_tpu.ops.pallas.histogram_mxu import histogram_mxu_packed

    n = 300000
    x = rng.integers(0, 256, (2, n)).astype(np.uint8)
    sizes = np.array([n, 12345], np.int32)
    W = -(-n // 4)
    xp = np.zeros((2, W * 4), np.uint8)
    xp[:, :n] = x
    got = np.asarray(
        histogram_mxu_packed(
            jnp.asarray(xp.view(np.uint32)), jnp.asarray(sizes)
        )
    )
    for b in range(2):
        exp = np.bincount(x[b, : sizes[b]], minlength=256).astype(np.uint32)
        assert np.array_equal(got[b], exp)


def test_fused_encode_decode_byte_exact(rng):
    from dietgpu_fork_tpu.core import reference as R
    from dietgpu_fork_tpu.models import ans as A

    enc = jax.jit(
        A.ans_encode_padded, static_argnames=("prob_bits", "use_checksum")
    )
    dec = jax.jit(
        A.ans_decode_padded, static_argnames=("out_capacity", "prob_bits")
    )
    sizes = [4095, 4096, 4097, 1, 70000]
    S = 70000
    x = np.zeros((len(sizes), S), np.uint8)
    datas = []
    for i, n in enumerate(sizes):
        d = np.minimum(rng.exponential(scale=25.6, size=n), 255).astype(
            np.uint8
        )
        x[i, :n] = d
        datas.append(d)
    comp, cb = enc(
        jnp.asarray(x), jnp.asarray(np.array(sizes, np.int32)), prob_bits=10,
        use_checksum=True,
    )
    comp = np.asarray(comp)
    cb = np.asarray(cb)
    for i, d in enumerate(datas):
        arc = R.ans_encode(d, prob_bits=10, use_checksum=True)
        assert cb[i] == arc.size
        assert np.array_equal(comp[i, : arc.size], arc)
    out, succ, so, _ = dec(jnp.asarray(comp), out_capacity=S, prob_bits=10)
    out = np.asarray(out)
    assert bool(np.all(np.asarray(succ)))
    for i, d in enumerate(datas):
        assert np.array_equal(out[i, : d.size], d)
