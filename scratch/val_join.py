"""Validate fused decode+join for bf16/fp16 and time float de/compress."""
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
ITERS = 6


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
    for ftname, nfl in [("BFLOAT16", 4096), ("FLOAT16", 4097),
                        ("BFLOAT16", 100000), ("FLOAT16", 1),
                        ("BFLOAT16", 12345)]:
        ft = FloatType[ftname]
        w = (rng.normal(0, 1, (2, nfl)).astype(np.float32)
             .view(np.uint32) >> 16).astype(np.uint16)
        W32 = -(-nfl // 2)
        pad = W32 * 2 - nfl
        wp = np.pad(w, ((0, 0), (0, pad)))
        d32 = jnp.asarray(wp.view(np.uint32))
        nn = jnp.full((2,), nfl, I32)
        comp32, cb = jax.jit(lambda d: float_compress_core(
            d, nn, ft, 10))(d32)
        out = jax.jit(lambda c: float_decompress_core(
            c, jnp.zeros((2,), I32), nfl, ft, 10))(comp32)
        got = np.asarray(out[0]).view(np.uint16)[:, :nfl]
        ok = np.array_equal(got, w) and np.asarray(out[1]).all()
        if not ok:
            fails += 1
            print(f"FAIL {ftname} n={nfl}", flush=True)
    print(f"fused join correctness: {5-fails}/5 pass", flush=True)

    # timing 16Mi bf16
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16
         ).astype(np.uint16)
    d32 = jnp.asarray(w.view(np.uint32).reshape(1, -1))
    nn = jnp.array([N], I32)
    comp32, cb = jax.jit(lambda d: float_compress_core(
        d, nn, FloatType.BFLOAT16, 10))(d32)
    comp32 = jnp.asarray(np.asarray(comp32))
    print("ratio:", int(np.asarray(cb)[0]) / (2 * N), flush=True)

    def build(k):
        @jax.jit
        def f(c):
            out = None
            for i in range(k):
                out = float_decompress_core(
                    c, jnp.zeros((1,), I32), N, FloatType.BFLOAT16, 10)
                c = c.at[:, -1:].set(out[0][:, :1] + U32(i))
            return out
        return lambda: f(comp32)
    dt = chain(build)
    print(f"float_decompress 16Mi bf16: {dt*1e3:.3f} ms "
          f"{2*N/dt/1e9:.2f} GB/s", flush=True)
    out = jax.jit(lambda c: float_decompress_core(
        c, jnp.zeros((1,), I32), N, FloatType.BFLOAT16, 10))(comp32)
    print("16Mi roundtrip:", np.array_equal(
        np.asarray(out[0]).view(np.uint16)[0, :N], w), flush=True)

    def build2(k):
        @jax.jit
        def f(d):
            out = None
            for i in range(k):
                out = float_compress_core(d, nn, FloatType.BFLOAT16, 10)
                d = d.at[:, :1].set(d[:, :1] ^ out[0][:, :1] ^ U32(i))
            return out
        return lambda: f(d32)
    dt = chain(build2)
    print(f"float_compress 16Mi bf16: {dt*1e3:.3f} ms "
          f"{2*N/dt/1e9:.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
