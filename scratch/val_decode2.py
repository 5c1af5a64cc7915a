"""Validate the v2 decoder on-chip: round-trip vs ans_encode_core across
prob_bits, sizes (block edges), and batches; then time 16Mi decode."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.models.ans import ans_encode_core, ans_decode_core
from dietgpu_fork_tpu.ops.bitops import bitcast_u8_to_u32

I32 = jnp.int32
U32 = jnp.uint32


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def roundtrip(data_u8, pb):
    B = data_u8.shape[0]
    S = data_u8.shape[1]
    sizes = jnp.asarray(
        np.full(B, S, np.int32) if np.ndim(S) == 0 else S
    )
    pad = (-S) % 4
    d8 = np.pad(data_u8, ((0, 0), (0, pad)))
    x32 = bitcast_u8_to_u32(jnp.asarray(d8))
    comp32, cb = jax.jit(
        lambda x: ans_encode_core(x, sizes, pb, s_bytes=S)
    )(x32)
    out32, ok, n, _ = jax.jit(
        lambda c: ans_decode_core(c, jnp.zeros((B,), I32), S, pb)
    )(comp32)
    out8 = np.asarray(out32).view(np.uint8)[:, :S]
    good = np.array_equal(out8[:, :S], data_u8) and np.asarray(ok).all()
    return good


def main():
    rng = np.random.default_rng(7)
    fails = 0
    cases = []
    for pb in (9, 10, 11):
        for S in (1, 100, 4095, 4096, 4097, 8192, 65536, 1 << 20):
            lam = 30
            d = np.minimum(
                rng.exponential(lam, (2, S)), 255
            ).astype(np.uint8)
            ok = roundtrip(d, pb)
            cases.append((pb, S, ok))
            if not ok:
                fails += 1
                print(f"FAIL pb={pb} S={S}")
    # batch of mixed sizes (padded rows)
    S = 50000
    d = np.minimum(rng.exponential(40, (5, S)), 255).astype(np.uint8)
    sizes = np.array([S, 1, 4097, 30000, 0], np.int32)
    for b, s in enumerate(sizes):
        d[b, s:] = 0
    x32 = bitcast_u8_to_u32(jnp.asarray(d))
    comp32, cb = jax.jit(
        lambda x: ans_encode_core(x, jnp.asarray(sizes), 10, s_bytes=S)
    )(x32)
    out32, ok, n, _ = jax.jit(
        lambda c: ans_decode_core(c, jnp.zeros((5,), I32), S, 10)
    )(comp32)
    out8 = np.asarray(out32).view(np.uint8)[:, :S]
    good = np.array_equal(out8, d) and np.asarray(ok).all()
    if not good:
        fails += 1
        print("FAIL mixed batch")
    print(f"correctness: {len(cases)+1-fails}/{len(cases)+1} pass")

    # timing: 16Mi exponent-like bytes
    N = 1 << 24
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16).astype(
        np.uint16
    )
    exp = ((w >> 7) & 0xFF).astype(np.uint8)  # bf16 rot-left-1 high byte
    x32 = bitcast_u8_to_u32(jnp.asarray(exp.reshape(1, -1)))
    sizes = jnp.array([N], I32)
    comp32, cb = jax.jit(lambda x: ans_encode_core(x, sizes, 10))(x32)
    comp32 = jnp.asarray(np.asarray(comp32))
    print("ratio:", int(np.asarray(cb)[0]) / N)

    ITERS = 6

    def dec_chain(k):
        @jax.jit
        def f(c):
            out = None
            for i in range(k):
                out = ans_decode_core(c, jnp.zeros((1,), I32), N, 10)
                c = c.at[:, -1:].set(out[0][:, :1] + U32(i))
            return out
        return lambda: f(comp32)

    f1, fk = dec_chain(1), dec_chain(ITERS)
    fence(f1()); fence(fk())
    t1s, tks = [], []
    for _ in range(4):
        t0 = time.time(); fence(f1()); t1s.append(time.time() - t0)
        t0 = time.time(); fence(fk()); tks.append(time.time() - t0)
    dt = (min(tks) - min(t1s)) / (ITERS - 1)
    print(f"ans_dec_core 16Mi: {dt*1e3:.3f} ms  {N/dt/1e9:.2f} GB/s")
    out32, ok, n, _ = jax.jit(
        lambda c: ans_decode_core(c, jnp.zeros((1,), I32), N, 10)
    )(comp32)
    print("16Mi roundtrip ok:",
          np.array_equal(np.asarray(out32).view(np.uint8)[0, :N], exp),
          bool(np.asarray(ok)[0]))


if __name__ == "__main__":
    main()
