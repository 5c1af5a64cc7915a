"""A/B the fp64 sparse compress after the strided-slice fix."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.sparse import (
    sparse_float_compress_core, sparse_float_decompress_core)

I32 = jnp.int32
U32 = jnp.uint32


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


rng = np.random.default_rng(3)
# correctness first (vs CPU-validated decompress round trip)
for n in (4096, 100000):
    x = rng.normal(0, 1, n)
    x[rng.random(n) < 0.5] = 0
    w = x.view(np.uint64).astype(np.uint64)
    d32 = jnp.asarray(
        np.ascontiguousarray(x).view(np.uint32).reshape(1, -1))
    nn = jnp.full((1,), n, I32)
    comp, cb = jax.jit(lambda d: sparse_float_compress_core(
        d, nn, FloatType.FLOAT64, 10))(d32)
    out = jax.jit(lambda c: sparse_float_decompress_core(
        c, n, FloatType.FLOAT64, 10))(comp)
    got = np.asarray(out[0]).view(np.float64)[0, :n]
    ok = np.array_equal(got.view(np.uint64), x.view(np.uint64)) and bool(
        np.asarray(out[1])[0])
    print(f"n={n}: {'OK' if ok else 'FAIL'}", flush=True)

N = 15_000_000
x = rng.normal(0, 1, N)
x[rng.random(N) < 0.5] = 0
d32 = jnp.asarray(np.ascontiguousarray(x).view(np.uint32).reshape(1, -1))
nn = jnp.full((1,), N, I32)
f = jax.jit(lambda d: sparse_float_compress_core(
    d, nn, FloatType.FLOAT64, 9))
fence(f(d32))
ts = []
for _ in range(3):
    t0 = time.time(); fence(f(d32)); ts.append(time.time() - t0)
dt = min(ts)
print(f"fp64 sparse compress 15M: {dt*1e3:.1f} ms "
      f"{8*N/dt/1e9:.2f} GB/s (single-call incl ~30ms dispatch)",
      flush=True)
