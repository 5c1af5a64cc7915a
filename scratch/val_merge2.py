"""Validate + time runs_merge v2 (numpy reference, fewer compiles)."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.ops.pallas.merge import _runs_merge_tpu, _runs_merge_tpu2

U32 = jnp.uint32


def np_ref(src, dst, srco, lens, out_len):
    out = np.zeros(out_len, np.uint32)
    for d, s, l in zip(dst, srco, lens):
        out[d:d + l] = src[s:s + l]
    return out


def fence(x):
    return np.asarray(x.ravel()[:1])


def chain_time(f, flat, args, iters=6):
    def build(k):
        @jax.jit
        def g(fl):
            out = None
            for i in range(k):
                out = f(fl, *args)
                fl = fl.at[:1].set(out[:1] + U32(i))
            return out
        return lambda: g(flat)
    f1, fk = build(1), build(iters)
    fence(f1()); fence(fk())
    t1s, tks = [], []
    for _ in range(4):
        t0 = time.time(); fence(f1()); t1s.append(time.time() - t0)
        t0 = time.time(); fence(fk()); tks.append(time.time() - t0)
    return max((min(tks) - min(t1s)) / (iters - 1), 1e-9)


rng = np.random.default_rng(11)
src_np = rng.integers(1, 2**32, 1 << 21, dtype=np.uint64).astype(np.uint32)
src = jnp.asarray(src_np)

for trial, (nr, maxlen) in enumerate([(500, 1200), (200, 20000),
                                      (1000, 40), (4, 400000)]):
    lens = rng.integers(0, maxlen, nr).astype(np.int32)
    gaps = rng.integers(0, 50, nr).astype(np.int32)
    dst = (np.cumsum(lens + gaps) - lens - gaps).astype(np.int32)
    srco = rng.integers(0, (1 << 21) - maxlen - 1, nr).astype(np.int32)
    out_len = int(dst[-1] + lens[-1]) + 7
    a = np.asarray(_runs_merge_tpu2(
        src, jnp.asarray(dst), jnp.asarray(srco), jnp.asarray(lens),
        out_len=out_len))
    b = np_ref(src_np, dst, srco, lens, out_len)
    ok = np.array_equal(a, b)
    print(f"trial {trial} (nr={nr} maxlen={maxlen}): "
          f"{'OK' if ok else 'WRONG'}", flush=True)
    if not ok:
        bad = np.nonzero(a != b)[0]
        print("  ndiff", bad.size, "first", bad[:8], a[bad[:4]], b[bad[:4]])

NB, SW = 4096, 1408
len2 = rng.integers(300, 400, NB).astype(np.int32)
dst2 = (np.arange(NB) * SW + (SW - len2)).astype(np.int32)
src2 = (np.cumsum(len2) - len2).astype(np.int32)
args = (jnp.asarray(dst2), jnp.asarray(src2), jnp.asarray(len2))
f2 = functools.partial(_runs_merge_tpu2, out_len=NB * SW)
dt2 = chain_time(lambda fl, *a: f2(fl, *a), src, args)
print(f"merge2-shape v2: {dt2*1e3:.3f} ms", flush=True)
f1v = functools.partial(_runs_merge_tpu, out_len=NB * SW)
dt1 = chain_time(lambda fl, *a: f1v(fl, *a), src, args)
print(f"merge2-shape v1: {dt1*1e3:.3f} ms", flush=True)
