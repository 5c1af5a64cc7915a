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
        runs_merge,
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
    a = runs_merge(
        src, jnp.asarray(dst), jnp.asarray(srco), jnp.asarray(lens), out_len
    )
    b = _runs_merge_ref(
        (src,), jnp.asarray(dst), jnp.asarray(srco), jnp.asarray(lens),
        out_len=out_len,
    )
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_runs_merge_smem_chunked_matches_reference(rng, monkeypatch):
    """When the piece metadata would overflow SMEM the merge splits into
    tile-aligned chunks with runs clipped per chunk (merge.py
    _runs_merge_tpu2). Force a tiny budget so a small case exercises the
    chunked path, including runs straddling chunk boundaries."""
    import dietgpu_fork_tpu.ops.pallas.merge as M

    src = jnp.asarray(
        rng.integers(0, 2**32, 1 << 20, dtype=np.uint64).astype(np.uint32)
    )
    lens = (rng.integers(0, 2000, 300) * 4).astype(np.int32)
    lens[5] = 150000  # straddles several 32768-word tiles/chunks
    gaps = (rng.integers(0, 3, 300) * 4).astype(np.int32)
    dst = (np.cumsum(lens + gaps) - (lens + gaps)).astype(np.int32)
    srco = (rng.integers(0, 1 << 17, 300) * 4).astype(np.int32)
    out_len = int(dst[-1] + lens[-1]) + 12
    # budget above the irreducible 2R run-slot term (~7.2 KB for 300 runs)
    # so the tile-chunked path engages rather than the ref fallback
    assert M._meta_bytes(300, out_len) > 8192  # chunking will engage
    monkeypatch.setattr(M, "_SMEM_META_BUDGET", 8192)
    a = M.runs_merge(
        src, jnp.asarray(dst), jnp.asarray(srco), jnp.asarray(lens), out_len
    )
    b = M._runs_merge_ref(
        (src,), jnp.asarray(dst), jnp.asarray(srco), jnp.asarray(lens),
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


def test_runs_merge_aligned_direct_dma(rng):
    """The kind-3 fast path: runs with src == dst (mod 128) and >= 8192
    words move by full-row direct DMA (merge.py _K3_FLAG pieces), including
    a multi-tile run shaped like the float codec's raw section."""
    from dietgpu_fork_tpu.ops.pallas.merge import (
        _runs_merge_ref,
        runs_merge,
    )

    out_len = 3_000_000
    dst = np.array([8, 2_100_008, 2_400_008], np.int32)
    lens = np.array([2_100_000, 250_000, 599_000], np.int32)
    src = np.array([136, 2_100_008 + 64, 2_500_000 + 8], np.int32)
    # run 0 and run 2 aligned (src-dst multiple of 128), run 1 not
    src_flat = jnp.asarray(
        rng.integers(1, 2**32, 3_200_000, dtype=np.uint64).astype(np.uint32)
    )
    d, s, l = map(jnp.asarray, (dst, src, lens))
    got = runs_merge(src_flat, d, s, l, out_len)
    want = _runs_merge_ref((src_flat,), d, s, l, out_len=out_len)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def _mask_bitmap_tail(got, N):
    """The production tail mask from sparse_float_compress_core: zero all
    bitmap bits at/after float N (MSB-first within each byte)."""
    wpos = np.arange(got.shape[1], dtype=np.int32)[None, :]
    r = np.clip(N - wpos * 32, 0, 32)
    fb = (r >> 3).astype(np.uint64)
    full = np.where(fb >= 4, 0xFFFFFFFF, (1 << (fb * 8)) - 1).astype(
        np.uint32
    )
    part = (((0xFF << (8 - (r & 7))) & 0xFF).astype(np.uint32)) << (
        fb * 8
    ).astype(np.uint32)
    return got & (full | np.where(r < 32, part, 0).astype(np.uint32))


@pytest.mark.parametrize("ftname", ["FLOAT32", "FLOAT64"])
def test_pack_bitmap32_64_matches_xla(rng, ftname):
    """pack_bitmap32_tpu / pack_bitmap64_tpu vs the XLA direct pack —
    the wide-word analogues of test_pack_bitmap16_matches_xla; these are
    on the production sparse fp32/fp64 compress path (models/sparse.py)."""
    from dietgpu_fork_tpu.core.constants import FloatType
    from dietgpu_fork_tpu.models import sparse as SP
    from dietgpu_fork_tpu.ops.pallas.bitmap_pack import (
        pack_bitmap32_tpu,
        pack_bitmap64_tpu,
    )

    ft = FloatType[ftname]
    wpf = 1 if ft == FloatType.FLOAT32 else 2  # u32 words per float
    kern = pack_bitmap32_tpu if wpf == 1 else pack_bitmap64_tpu
    for N, B in ((100_000, 1), (8192, 3), (31, 1), (131072 + 77, 2)):
        x = rng.normal(0, 1, (B, N))
        x[rng.random((B, N)) < 0.5] = 0
        if ft == FloatType.FLOAT32:
            d = np.ascontiguousarray(x.astype(np.float32)).view(np.uint32)
        else:
            d = np.ascontiguousarray(x.astype(np.float64)).view(np.uint32)
        d = jnp.asarray(d)
        n = jnp.full((B,), N, jnp.int32)
        S_cap = SP._floats_capacity(d.shape[1], ft)
        want = np.asarray(SP._pack_bitmap_direct(d, n, S_cap, ft))
        got = np.asarray(kern(d))[:, : -(-S_cap // 32)]
        got = _mask_bitmap_tail(got, N)
        W = min(want.shape[1], got.shape[1])
        assert np.array_equal(got[:, :W], want[:, :W]), (ftname, N, B)
        assert not want[:, W:].any() and not got[:, W:].any()


def test_pack_bitmap16_matches_xla(rng):
    from dietgpu_fork_tpu.core.constants import FloatType
    from dietgpu_fork_tpu.models import sparse as SP
    from dietgpu_fork_tpu.ops.pallas.bitmap_pack import pack_bitmap16_tpu

    for N, B in ((100_000, 1), (8192, 3), (31, 1)):
        x = rng.normal(0, 1, (B, N))
        x[rng.random((B, N)) < 0.5] = 0
        w = x.astype(np.float16).view(np.uint16)
        w = np.pad(w, ((0, 0), (0, (-N) % 2)))
        if N % 2:
            w[:, -1] = 0x7777  # poison padding: masking must hide it
        d = jnp.asarray(w.view(np.uint32))
        n = jnp.full((B,), N, jnp.int32)
        S_cap = SP._floats_capacity(d.shape[1], FloatType.FLOAT16)
        want = np.asarray(
            SP._pack_bitmap_direct(d, n, S_cap, FloatType.FLOAT16)
        )
        got = np.asarray(pack_bitmap16_tpu(d))[:, : -(-S_cap // 32)]
        wpos = np.arange(got.shape[1], dtype=np.int32)[None, :]
        r = np.clip(N - wpos * 32, 0, 32)
        fb = (r >> 3).astype(np.uint64)
        full = np.where(fb >= 4, 0xFFFFFFFF, (1 << (fb * 8)) - 1).astype(
            np.uint32
        )
        part = (((0xFF << (8 - (r & 7))) & 0xFF).astype(np.uint32)) << (
            fb * 8
        ).astype(np.uint32)
        got = got & (full | np.where(r < 32, part, 0).astype(np.uint32))
        W = min(want.shape[1], got.shape[1])
        assert np.array_equal(got[:, :W], want[:, :W]), (N, B)
        assert not want[:, W:].any() and not got[:, W:].any()
