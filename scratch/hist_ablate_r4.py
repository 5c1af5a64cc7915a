"""r4 split+hist ablation at 16Mi bf16: where do 1.87 ms go?

Variants: split only | split+hist (current) | split+hist width16 dots |
split+hist no-checksum | standalone hist. Monkeypatches module internals
and clears jit caches between variants.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

import dietgpu_fork_tpu.ops.pallas.float_split_fused as fsf
from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.ops.pallas.histogram_mxu import (
    histogram_mxu_packed, _onehot16,
)

N = 1 << 24
U32, I32 = jnp.uint32, jnp.int32
ITERS = 8


def fence(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])


def chain_time(f, args, K=ITERS):
    def chain(*a):
        out = f(*a)
        for _ in range(K - 1):
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(U32)
            out = f(a[0] ^ s, *a[1:])
        return out

    f1 = jax.jit(f)
    ck = jax.jit(chain)
    fence(f1(*args))
    fence(ck(*args))
    t1, tk = [], []
    for _ in range(5):
        t0 = time.perf_counter(); fence(f1(*args))
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fence(ck(*args))
        tk.append(time.perf_counter() - t0)
    return (min(tk) - min(t1)) / (K - 1)


def hist_accum_w(width):
    def _hist_accum(plane, acc, first, base_byte, nbytes):
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        R = plane.shape[0]
        lane = fsf._lane((R, 128))
        row = jax.lax.broadcasted_iota(I32, (R, 128), 0)
        val = lane >> 3
        idx0 = (lane & 7) >> 2
        sh = ((lane & 3) * 8).astype(jnp.uint32)
        pos0 = base_byte + row * 512 + idx0 * 4 + (lane & 3)

        @pl.when(first)
        def _():
            acc[...] = jnp.zeros((128, 128), jnp.float32)

        def body(g, total):
            his, los = [], []
            for t in range(width):
                gg = g * width + t
                w = jnp.take_along_axis(plane, idx0 + 2 * gg, axis=1)
                b = ((w >> sh) & jnp.uint32(0xFF)).astype(I32)
                b = jnp.where(pos0 + 8 * gg < nbytes, b, 0)
                his.append(_onehot16(b >> 4, val))
                los.append(_onehot16(b & 0xF, val))
            a_hi = jnp.concatenate(his, axis=0)
            a_lo = jnp.concatenate(los, axis=0)
            return total + jax.lax.dot_general(
                a_hi, a_lo,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        total = jax.lax.fori_loop(
            0, 64 // width, body, jnp.zeros((128, 128), jnp.float32),
            unroll=False,
        )
        acc[...] = acc[...] + total

    return _hist_accum


def xor_noop(x_ref, accx, first, base_word, nbytes):
    from jax.experimental import pallas as pl

    @pl.when(first)
    def _():
        accx[...] = jnp.zeros((8, 128), U32)


def main():
    rng = np.random.default_rng(0)
    w16 = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16
           ).astype(np.uint16)
    d = jnp.asarray(w16.view(np.uint32).reshape(1, -1))
    n32 = jnp.asarray([N], I32)
    plane = jnp.asarray(
        rng.integers(0, 2**32, (1, N // 4), dtype=np.uint32)
    )

    t = chain_time(
        lambda a, s: histogram_mxu_packed(a, s), (plane, n32))
    print(f"standalone hist 16MiB plane:      {t*1e3:.3f} ms", flush=True)

    t = chain_time(
        lambda a: fsf.split_packed_tpu(a, FloatType.BFLOAT16), (d,))
    print(f"split only:                       {t*1e3:.3f} ms", flush=True)

    t = chain_time(
        lambda a, s: fsf.split_hist_packed_tpu(a, s, FloatType.BFLOAT16),
        (d, n32))
    print(f"split+hist+csum (current):        {t*1e3:.3f} ms", flush=True)

    orig_hist, orig_xor = fsf._hist_accum, fsf._xor_accum

    fsf._xor_accum = xor_noop
    jax.clear_caches()
    t = chain_time(
        lambda a, s: fsf.split_hist_packed_tpu(a, s, FloatType.BFLOAT16),
        (d, n32))
    print(f"split+hist (csum noop):           {t*1e3:.3f} ms", flush=True)

    fsf._hist_accum = hist_accum_w(16)
    jax.clear_caches()
    t = chain_time(
        lambda a, s: fsf.split_hist_packed_tpu(a, s, FloatType.BFLOAT16),
        (d, n32))
    print(f"split+hist w16 (csum noop):       {t*1e3:.3f} ms", flush=True)

    fsf._xor_accum = orig_xor
    jax.clear_caches()
    t = chain_time(
        lambda a, s: fsf.split_hist_packed_tpu(a, s, FloatType.BFLOAT16),
        (d, n32))
    print(f"split+hist w16 + csum:            {t*1e3:.3f} ms", flush=True)

    # correctness of w16 vs current
    h_new = np.asarray(
        jax.jit(lambda a, s: fsf.split_hist_packed_tpu(
            a, s, FloatType.BFLOAT16))(d, n32)[2][0])
    fsf._hist_accum = orig_hist
    jax.clear_caches()
    h_old = np.asarray(
        jax.jit(lambda a, s: fsf.split_hist_packed_tpu(
            a, s, FloatType.BFLOAT16))(d, n32)[2][0])
    print("w16 hist matches:", np.array_equal(h_new, h_old), flush=True)


if __name__ == "__main__":
    main()
