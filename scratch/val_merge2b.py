"""Minimal merge v2 repro."""
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.ops.pallas.merge import (
    _runs_merge_ref, _runs_merge_tpu2)

print("start", flush=True)
rng = np.random.default_rng(11)
src = jnp.asarray(
    rng.integers(1, 2**32, 1 << 16, dtype=np.uint64).astype(np.uint32))
lens = np.array([100, 0, 1280, 1281, 5000, 37], np.int32)
gaps = np.array([3, 0, 5, 0, 11, 2], np.int32)
dst = (np.cumsum(lens + gaps) - lens - gaps).astype(np.int32)
srco = np.array([7, 0, 1000, 2000, 9000, 40000], np.int32)
out_len = int(dst[-1] + lens[-1]) + 7
print("calling tpu2, out_len", out_len, flush=True)
a = _runs_merge_tpu2(src, jnp.asarray(dst), jnp.asarray(srco),
                     jnp.asarray(lens), out_len=out_len)
a = np.asarray(a)
print("tpu2 done", flush=True)
b = np.asarray(_runs_merge_ref(src, jnp.asarray(dst), jnp.asarray(srco),
                               jnp.asarray(lens), out_len=out_len))
ok = np.array_equal(a, b)
print("match:", ok, flush=True)
if not ok:
    bad = np.nonzero(a != b)[0]
    print("ndiff", bad.size, "first", bad[:10])
    print("got ", a[bad[:10]])
    print("want", b[bad[:10]])
