import time, functools
import numpy as np, jax, jax.numpy as jnp

def fence(x): return np.asarray(x.ravel()[:1])
N = 6 << 20
src = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, (2, N), dtype=np.uint64).astype(np.uint32))
off = jnp.array([12345, 54321], jnp.int32)

@jax.jit
def f(s, o):
    return jax.vmap(lambda row, oo: jax.lax.dynamic_slice(row, (oo,), (4 << 20,)))(s, o)

out = f(src, off)
ok = np.array_equal(np.asarray(out)[0], np.asarray(src)[0, 12345:12345 + (4<<20)])
fence(out)
ts = []
for _ in range(6):
    t0 = time.time(); fence(f(src, off)); ts.append(time.time() - t0)
print("dynslice 2x16MiB:", ok, f"{min(ts)*1e3:.3f} ms (incl dispatch)")

# chained version to remove dispatch
@jax.jit
def g(s, o):
    out = None
    for i in range(6):
        out = jax.vmap(lambda row, oo: jax.lax.dynamic_slice(row, (oo,), (4 << 20,)))(s, o)
        o = (o + out[:, 0].astype(jnp.int32) % 7) % 1000
    return out
fence(g(src, off))
ts2 = []
for _ in range(6):
    t0 = time.time(); fence(g(src, off)); ts2.append(time.time() - t0)
per = (min(ts2) - min(ts)) / 5
print(f"chained per-iter: {per*1e3:.3f} ms -> {2*(4<<20)*4/per/1e9:.1f} GB/s")
