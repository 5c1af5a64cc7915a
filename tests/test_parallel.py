"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.parallel import collectives as coll
from dietgpu_fork_tpu.parallel import sharded as sh
from tests.conftest import make_float_words


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return sh.data_mesh()


def test_sharded_float_roundtrip(rng, mesh):
    B, n = 8, 5000
    words = np.stack([make_float_words(rng, FloatType.BFLOAT16, n) for _ in range(B)])
    data32 = jnp.asarray(words.view(np.uint32))
    sizes = jnp.full((B,), n, jnp.int32)
    xs = sh.shard_batch(mesh, data32)
    ss = sh.shard_batch(mesh, sizes)

    comp, comp_bytes = sh.float_compress_sharded(
        mesh, xs, ss, FloatType.BFLOAT16
    )
    # sharded archives must equal single-device archives
    from dietgpu_fork_tpu.models.float_codec import float_compress_padded

    ref_comp, ref_bytes = jax.jit(
        float_compress_padded,
        static_argnames=("float_type", "prob_bits", "use_checksum"),
    )(data32, sizes, float_type=FloatType.BFLOAT16)
    assert np.array_equal(np.asarray(comp_bytes), np.asarray(ref_bytes))
    assert np.array_equal(np.asarray(comp), np.asarray(ref_comp))

    out32, success, nsz, _, _ = sh.float_decompress_sharded(
        mesh, comp, n, FloatType.BFLOAT16
    )
    assert np.all(np.asarray(success))
    got = np.asarray(out32).view(np.uint8)[:, : n * 2]
    assert np.array_equal(got, words.view(np.uint8))

    allsz = sh.global_compressed_sizes(comp_bytes, mesh)
    assert np.array_equal(np.asarray(allsz), np.asarray(ref_bytes))


def test_sharded_ans_roundtrip(rng, mesh):
    B, S = 8, 8192
    x = rng.integers(0, 64, (B, S), np.uint8)
    xs = sh.shard_batch(mesh, jnp.asarray(x))
    ss = sh.shard_batch(mesh, jnp.full((B,), S, jnp.int32))
    comp, _ = sh.ans_encode_sharded(mesh, xs, ss)
    out, success, sizes, _ = sh.ans_decode_sharded(mesh, comp, S)
    assert np.all(np.asarray(success))
    assert np.array_equal(np.asarray(out), x)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_compressed_all_gather(rng, mesh, dtype):
    x = jnp.asarray(rng.normal(0, 1, (8, 2048)), dtype)
    got, ok, wire = jax.jit(
        lambda v: coll.compressed_all_gather(v, mesh, return_stats=True)
    )(x)
    assert np.all(np.asarray(ok))
    assert got.dtype == x.dtype
    assert got.shape == x.shape  # gathered back to the global shape
    assert np.array_equal(
        np.asarray(got).view(np.uint8), np.asarray(x).view(np.uint8)
    )
    # two-phase wire: payload words moved track the ACTUAL archive size
    # (to chunk granularity), and never exceed raw + one chunk
    raw_w = 2048 * np.dtype(np.float32 if dtype == jnp.float32 else np.float16
                            ).itemsize // 4
    assert np.all(np.asarray(wire) <= raw_w + 128)


def test_compressed_all_gather_incompressible_rides_raw(rng, mesh):
    # uniform random bits don't compress: the wire protocol falls back to
    # shipping the raw words (flag 2) -- lossless, ok=True, wire ~= raw
    bits = rng.integers(0, 2**32, (8, 2048), dtype=np.uint64).astype(np.uint32)
    x = jnp.asarray(bits).view(jnp.float32)
    got, ok, wire = jax.jit(
        lambda v: coll.compressed_all_gather(v, mesh, return_stats=True)
    )(x)
    assert np.all(np.asarray(ok))
    assert np.array_equal(
        np.asarray(got).view(np.uint32), np.asarray(x).view(np.uint32)
    )
    # raw shard is 2048 u32 words; wire is that rounded up to one chunk
    assert np.all(np.asarray(wire) <= 2048 + 128)


def test_compressed_all_gather_wire_tracks_ratio(rng, mesh):
    # compressible bf16: wire words must come in near the natural archive
    # ratio (~0.68 raw), far below raw -- the static-budget scheme this
    # replaced always paid ~0.78 regardless of content
    n = 32768
    x = jnp.asarray(rng.normal(0, 1, (8, n)), jnp.bfloat16)
    got, ok, wire = jax.jit(
        lambda v: coll.compressed_all_gather(v, mesh, return_stats=True)
    )(x)
    assert np.all(np.asarray(ok))
    raw_w = n * 2 // 4
    from dietgpu_fork_tpu.api.codec import compress_data

    comp, sizes, _ = compress_data(True, [x[0]])
    natural = int(np.asarray(sizes)[0]) / (n * 2)
    assert np.all(np.asarray(wire) * 4 <= (natural + 0.02) * n * 2), (
        np.asarray(wire) * 4 / (n * 2), natural)


def test_compressed_all_reduce(rng, mesh):
    x = jnp.asarray(rng.normal(0, 1, (8, 1, 1024)), jnp.float32)
    got, ok = jax.jit(
        lambda v: coll.compressed_all_reduce(v, mesh)
    )(x)
    assert np.all(np.asarray(ok))
    assert got.shape == x.shape  # replicated sum, one row per device
    want = np.asarray(jnp.sum(x, axis=0))
    # transport is lossless; only the ring's reduction order differs from
    # jnp.sum's, so compare within float tolerance
    for d in range(8):
        assert np.allclose(np.asarray(got)[d], want, rtol=1e-6, atol=1e-6)


def test_compressed_reduce_scatter(rng, mesh):
    n = 4096
    x = jnp.asarray(rng.normal(0, 1, (8, n)), jnp.float32)
    got, ok = jax.jit(
        lambda v: coll.compressed_reduce_scatter(v, mesh)
    )(x)
    assert np.all(np.asarray(ok))
    assert got.shape == (8, n // 8)
    want = np.asarray(jnp.sum(x, axis=0)).reshape(8, n // 8)
    assert np.allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_compressed_reduce_scatter_bf16_exact_vs_ring_order(rng, mesh):
    # bf16 transport is lossless: re-simulate the ring's exact add order
    n = 2048
    x = jnp.asarray(rng.normal(0, 1, (8, n)), jnp.bfloat16)
    got, ok = jax.jit(
        lambda v: coll.compressed_reduce_scatter(v, mesh)
    )(x)
    assert np.all(np.asarray(ok))
    xs = np.asarray(x).reshape(8, 8, n // 8)
    for d in range(8):
        c = d  # chunk landing on device d
        order = [(c + i) % 8 for i in range(8)]  # ring add order
        acc = jnp.asarray(xs[order[0], c])
        for dev in order[1:]:
            acc = acc + jnp.asarray(xs[dev, c])
        assert np.array_equal(
            np.asarray(got)[d].view(np.uint8), np.asarray(acc).view(np.uint8)
        )


def test_compressed_ppermute(rng, mesh):
    x = jnp.asarray(rng.normal(0, 1, (8, 512)), jnp.bfloat16)
    perm = [(i, (i + 1) % 8) for i in range(8)]
    got, ok = jax.jit(
        lambda v: coll.compressed_ppermute(v, mesh, perm)
    )(x)
    assert np.all(np.asarray(ok))
    want = np.roll(np.asarray(x), 1, axis=0)
    assert np.array_equal(
        np.asarray(got).view(np.uint8), want.view(np.uint8)
    )


def test_shared_table_encode(rng, mesh):
    # shared-frequency-table mode: one histogram all-reduced over the mesh,
    # all members encoded against the identical broadcast table
    B, S = 8, 8192
    x = rng.integers(0, 48, (B, S), np.uint8)
    sizes = jnp.full((B,), S, jnp.int32)
    xs = sh.shard_batch(mesh, jnp.asarray(x))
    ss = sh.shard_batch(mesh, sizes)
    comp, comp_bytes = sh.ans_encode_shared_table(mesh, xs, ss)

    comp_np = np.asarray(comp)
    # every archive embeds the SAME packed pdf table (words 8..136)
    tables = comp_np[:, 32:544]
    for i in range(1, B):
        assert np.array_equal(tables[i], tables[0])

    # archives decode bit-exact through the ordinary path
    out, success, nsz, _ = sh.ans_decode_sharded(mesh, comp, S)
    assert np.all(np.asarray(success))
    assert np.array_equal(np.asarray(out)[:, :S], x)

    # and equal the single-device shared-table encode (same hist, same tots)
    from dietgpu_fork_tpu.models.ans import ans_encode_padded
    from dietgpu_fork_tpu.ops.bitops import bitcast_u8_to_u32
    from dietgpu_fork_tpu.ops.histogram import histogram_packed

    x32 = bitcast_u8_to_u32(jnp.asarray(x))
    gh = histogram_packed(x32, sizes).sum(axis=0, dtype=jnp.uint32)
    ref, ref_bytes = jax.jit(
        ans_encode_padded, static_argnames=("prob_bits", "use_checksum")
    )(
        jnp.asarray(x), sizes,
        hist=jnp.broadcast_to(gh[None], (B, 256)),
        hist_totals=jnp.full((B,), B * S, jnp.int32),
    )
    assert np.array_equal(np.asarray(comp_bytes), np.asarray(ref_bytes))
    assert np.array_equal(comp_np, np.asarray(ref))
