"""Fuzz the kind-3 (aligned direct-DMA) merge path vs the gather reference."""
import numpy as np
import jax.numpy as jnp
from dietgpu_fork_tpu.ops.pallas.merge import _runs_merge_tpu2, _runs_merge_ref

rng = np.random.default_rng(3)
for trial in range(6):
    R = int(rng.integers(2, 12))
    out_len = int(rng.integers(100_000, 1_500_000))
    # build non-overlapping sorted dst runs, half of them 128-aligned long
    cuts = np.sort(rng.choice(out_len - 1, 2 * R, replace=False)) + 1
    dst = cuts[0::2].astype(np.int32)
    lens = (cuts[1::2] - cuts[0::2]).astype(np.int32)
    src = np.empty(R, np.int32)
    total = int(lens.sum()) + 200_000
    for i in range(R):
        s = int(rng.integers(0, 50_000))
        if rng.random() < 0.6:
            # force src == dst (mod 128) so long runs hit the direct path
            s = s - (s % 128) + int(dst[i] % 128)
        src[i] = s + i * (total // R)
    src_flat = jnp.asarray(
        rng.integers(1, 2**32, total + 300_000, dtype=np.uint32))
    d, s_, l = map(jnp.asarray, (dst, src, lens))
    got = np.asarray(_runs_merge_tpu2(src_flat, d, s_, l, out_len=out_len))
    want = np.asarray(_runs_merge_ref(src_flat, d, s_, l, out_len=out_len))
    n_al = sum(1 for i in range(R)
               if (src[i] - dst[i]) % 128 == 0 and lens[i] >= 8192)
    ok = np.array_equal(got, want)
    print(f"trial {trial}: R={R} out={out_len} aligned_long={n_al} "
          f"{'OK' if ok else 'MISMATCH at ' + str(np.flatnonzero(got != want)[:5])}",
          flush=True)
    assert ok
print("all OK")

# giant aligned run crossing many tiles (the raw-section shape)
rng = np.random.default_rng(9)
out_len = 6_000_000
dst = np.array([8, 4_200_008], np.int32)
lens = np.array([4_200_000, 1_500_000], np.int32)
src = np.array([136, 4_200_136 + 64], np.int32)  # run0 aligned, run1 not
src_flat = jnp.asarray(rng.integers(1, 2**32, 6_200_000, dtype=np.uint32))
d, s_, l = map(jnp.asarray, (dst, src, lens))
got = np.asarray(_runs_merge_tpu2(src_flat, d, s_, l, out_len=out_len))
want = np.asarray(_runs_merge_ref(src_flat, d, s_, l, out_len=out_len))
assert np.array_equal(got, want), np.flatnonzero(got != want)[:8]
print("giant aligned run OK")
