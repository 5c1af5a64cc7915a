"""Validate fp32 fused decode+join and time fp32 decompress."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core, float_decompress_core)

I32 = jnp.int32
U32 = jnp.uint32
N = 1 << 24
ITERS = 5


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chain(build):
    f1, fk = build(1), build(ITERS)
    fence(f1()); fence(fk())
    t1s, tks = [], []
    for _ in range(4):
        t0 = time.time(); fence(f1()); t1s.append(time.time() - t0)
        t0 = time.time(); fence(fk()); tks.append(time.time() - t0)
    return max((min(tks) - min(t1s)) / (ITERS - 1), 1e-9)


def main():
    rng = np.random.default_rng(5)
    fails = 0
    for nfl in (4096, 4097, 100000, 1, 123457):
        w = rng.normal(0, 1, (2, nfl)).astype(np.float32).view(np.uint32)
        W32 = -(-nfl // 4) * 4
        wp = np.zeros((2, W32), np.uint32)
        wp[:, :nfl] = w
        d32 = jnp.asarray(wp)
        nn = jnp.full((2,), nfl, I32)
        comp32, cb = jax.jit(lambda d: float_compress_core(
            d, nn, FloatType.FLOAT32, 10))(d32)
        out = jax.jit(lambda c: float_decompress_core(
            c, jnp.zeros((2,), I32), nfl, FloatType.FLOAT32, 10))(comp32)
        got = np.asarray(out[0])[:, :nfl]
        ok = np.array_equal(got, w) and np.asarray(out[1]).all()
        if not ok:
            fails += 1
            bad = np.nonzero(got != w)
            print(f"FAIL n={nfl} ndiff={bad[0].size} "
                  f"first={list(zip(*[b[:4] for b in bad]))}", flush=True)
    print(f"fp32 fused join: {5-fails}/5 pass", flush=True)

    w = rng.normal(0, 1, N).astype(np.float32).view(np.uint32)
    d32 = jnp.asarray(w.reshape(1, -1))
    nn = jnp.array([N], I32)
    comp32, cb = jax.jit(lambda d: float_compress_core(
        d, nn, FloatType.FLOAT32, 10))(d32)
    comp32 = jnp.asarray(np.asarray(comp32))
    print("ratio:", int(np.asarray(cb)[0]) / (4 * N), flush=True)

    def build(k):
        @jax.jit
        def f(c):
            out = None
            for i in range(k):
                out = float_decompress_core(
                    c, jnp.zeros((1,), I32), N, FloatType.FLOAT32, 10)
                c = c.at[:, -1:].set(out[0][:, :1] + U32(i))
            return out
        return lambda: f(comp32)
    dt = chain(build)
    print(f"fp32 decompress 16Mi: {dt*1e3:.3f} ms {4*N/dt/1e9:.2f} GB/s",
          flush=True)
    out = jax.jit(lambda c: float_decompress_core(
        c, jnp.zeros((1,), I32), N, FloatType.FLOAT32, 10))(comp32)
    print("16Mi roundtrip:", np.array_equal(np.asarray(out[0])[0, :N], w),
          flush=True)


if __name__ == "__main__":
    main()
