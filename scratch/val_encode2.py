"""Validate + time the reworked encoder phase A on-chip."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.models.ans import ans_encode_core, ans_decode_core
from dietgpu_fork_tpu.ops.bitops import bitcast_u8_to_u32
from dietgpu_fork_tpu.ops.histogram import histogram_packed
from dietgpu_fork_tpu.ops.table import (
    normalize_probs_batched, pack_encode_table)
from dietgpu_fork_tpu.ops.rans_encode import encode_blocks

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
    rng = np.random.default_rng(3)
    # correctness on a few shapes vs decode round trip
    fails = 0
    for pb, S in [(10, 4096), (10, 4097), (9, 65536), (11, 100000), (10, 1)]:
        d = np.minimum(rng.exponential(30, (2, S)), 255).astype(np.uint8)
        pad = (-S) % 4
        x32 = bitcast_u8_to_u32(jnp.asarray(np.pad(d, ((0, 0), (0, pad)))))
        sizes = jnp.full((2,), S, I32)
        comp32, cb = jax.jit(
            lambda x: ans_encode_core(x, sizes, pb, s_bytes=S))(x32)
        out32, ok, n, _ = jax.jit(
            lambda c: ans_decode_core(c, jnp.zeros((2,), I32), S, pb))(comp32)
        good = np.array_equal(
            np.asarray(out32).view(np.uint8)[:, :S], d
        ) and np.asarray(ok).all()
        if not good:
            fails += 1
            print(f"FAIL pb={pb} S={S}", flush=True)
    print(f"encoder correctness: {5-fails}/5 pass", flush=True)

    # oracle byte-exactness on one case
    from dietgpu_fork_tpu.core.reference import ans_encode as ans_encode_ref
    S = 50000
    d = np.minimum(rng.exponential(50, (1, S)), 255).astype(np.uint8)
    x32 = bitcast_u8_to_u32(jnp.asarray(d))
    sizes = jnp.full((1,), S, I32)
    comp32, cb = jax.jit(
        lambda x: ans_encode_core(x, sizes, 10, s_bytes=S))(x32)
    got = np.asarray(comp32).view(np.uint8)[0]
    want = ans_encode_ref(d[0], 10)
    nb = int(np.asarray(cb)[0])
    print("oracle byte-exact:",
          nb == len(want) and np.array_equal(got[:nb], np.frombuffer(
              want, np.uint8)), flush=True)

    # timing: encode_blocks alone + ans_encode_core on 16Mi
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16).astype(
        np.uint16)
    exp = ((w >> 7) & 0xFF).astype(np.uint8)
    x32 = bitcast_u8_to_u32(jnp.asarray(exp.reshape(1, -1)))
    sizes = jnp.array([N], I32)
    hist = jax.jit(histogram_packed)(x32, sizes)
    pdf, cdf, magic, shift = jax.jit(
        lambda h, s: normalize_probs_batched(h, s, 10))(hist, sizes)
    packed = jnp.asarray(np.asarray(pack_encode_table(pdf, cdf, shift)))
    magic = jnp.asarray(np.asarray(magic))
    hist = jnp.asarray(np.asarray(hist))

    def build(k):
        @jax.jit
        def f(p):
            out = None
            for i in range(k):
                out = encode_blocks(p, sizes, packed, magic, 10)
                p = p.at[:, :1].set(p[:, :1] ^ out[1][:, 0, :1] ^ U32(i))
            return out
        return lambda: f(x32)
    dt = chain(build)
    print(f"encode_blocks 16Mi: {dt*1e3:.3f} ms  {N/dt/1e9:.2f} GB/s",
          flush=True)

    def build2(k):
        @jax.jit
        def f(p):
            out = None
            for i in range(k):
                out = ans_encode_core(p, sizes, 10, hist=hist)
                p = p.at[:, :1].set(p[:, :1] ^ out[0][:, :1] ^ U32(i))
            return out
        return lambda: f(x32)
    dt = chain(build2)
    print(f"ans_encode_core 16Mi: {dt*1e3:.3f} ms  {N/dt/1e9:.2f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
