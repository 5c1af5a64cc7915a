"""Round-3 histogram probe: where does histogram_mxu_packed's time go, and
which variants beat it?

Variants (all on 16 MiB packed bytes, B=1):
  base      - current histogram_mxu_packed
  nodot     - same VPU work, MXU dots removed (measures VPU-only cost)
  novpu     - dots on constant matrices, one-hot build removed (MXU-only)
  unroll4   - fori_loop unroll=4
  unroll8   - fori_loop unroll=8
  rangecmp  - hi-nibble test as 16-value range compare without shift chain

Chained-timing method from bench.py (min of K-chain minus min single).
Run: PYTHONPATH=/root/repo:/root/.axon_site python scratch/probe_r3_hist.py
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32
BF16 = jnp.bfloat16
_R = 1024


def _hist_body(byte_of, groups, acc, unroll):
    lane = jax.lax.broadcasted_iota(I32, (_R, 128), 1)
    val = lane >> 3

    def body(g, total):
        b = byte_of(g, lane)
        a_hi = jnp.where((b >> 4) == val, 1.0, 0.0).astype(BF16)
        a_lo = jnp.where((b & 0xF) == val, 1.0, 0.0).astype(BF16)
        return total + jax.lax.dot_general(
            a_hi, a_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    total = jax.lax.fori_loop(
        0, groups, body, jnp.zeros((128, 128), jnp.float32), unroll=unroll
    )
    acc[...] = acc[...] + total


def _mk_kernel(mode, unroll):
    def kern(x_ref, out_ref, acc, *, nch):
        ch = pl.program_id(1)

        @pl.when(ch == 0)
        def _():
            acc[...] = jnp.zeros((128, 128), jnp.float32)

        x = pltpu.bitcast(x_ref[...], I32)
        lane = jax.lax.broadcasted_iota(I32, (_R, 128), 1)
        val = lane >> 3

        if mode == "novpu":
            a = (x[:, :128].astype(jnp.float32) * 0 + 1).astype(BF16)

            def body(g, total):
                return total + jax.lax.dot_general(
                    a, a, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 64, body, jnp.zeros((128, 128), jnp.float32),
                unroll=unroll,
            )
        elif mode == "nodot":
            def body(g, total):
                idx = g * 2 + ((lane & 7) >> 2)
                w = jnp.take_along_axis(x, idx, axis=1)
                b = (w >> ((lane & 3) * 8)) & 0xFF
                a_hi = jnp.where((b >> 4) == val, 1.0, 0.0).astype(BF16)
                a_lo = jnp.where((b & 0xF) == val, 1.0, 0.0).astype(BF16)
                # consume without a dot (cheap reduce to keep it live)
                return total + a_hi.astype(jnp.float32)[:128] + \
                    a_lo.astype(jnp.float32)[:128]

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 64, body, jnp.zeros((128, 128), jnp.float32),
                unroll=unroll,
            )
        elif mode == "rangecmp":
            lo_t = val << 4          # hi nibble == val  <=>  b in [val*16, val*16+15]
            hi_t = lo_t + 15

            def byte_of(g, lane):
                idx = g * 2 + ((lane & 7) >> 2)
                w = jnp.take_along_axis(x, idx, axis=1)
                return (w >> ((lane & 3) * 8)) & 0xFF

            def body(g, total):
                b = byte_of(g, lane)
                a_hi = jnp.where((b >= lo_t) & (b <= hi_t), 1.0, 0.0).astype(BF16)
                a_lo = jnp.where((b & 0xF) == val, 1.0, 0.0).astype(BF16)
                return total + jax.lax.dot_general(
                    a_hi, a_lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 64, body, jnp.zeros((128, 128), jnp.float32),
                unroll=unroll,
            )
        elif mode == "relu":
            # arithmetic one-hot: relu(1-|d|) in bf16, no i1 masks/selects
            def body(g, total):
                idx = g * 2 + ((lane & 7) >> 2)
                w = jnp.take_along_axis(x, idx, axis=1)
                b = (w >> ((lane & 3) * 8)) & 0xFF
                dh = (b >> 4).astype(BF16) - val.astype(BF16)
                dl = (b & 0xF).astype(BF16) - val.astype(BF16)
                a_hi = jnp.maximum(BF16(1.0) - jnp.abs(dh), BF16(0.0))
                a_lo = jnp.maximum(BF16(1.0) - jnp.abs(dl), BF16(0.0))
                return total + jax.lax.dot_general(
                    a_hi, a_lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 64, body, jnp.zeros((128, 128), jnp.float32),
                unroll=unroll,
            )
        elif mode == "slabval":
            # slab-major: value on the M axis via broadcast, NO gather and
            # no variable shift. A[(v, s), (r8, l)] built from free views;
            # matmul is A (128, K) . B (128, K)^T contracting K.
            val16 = jax.lax.broadcasted_iota(
                I32, (16, 1, 1, 1), 0).astype(BF16)

            def plane_hist(b_plane, total):
                # b_plane: (R, 128) i32 bytes; view (8, R8, 128) slabs
                b8 = b_plane.reshape(8, _R // 8, 128)
                dh = (b8 >> 4).astype(BF16)[None] - val16
                dl = (b8 & 0xF).astype(BF16)[None] - val16
                a_hi = jnp.maximum(BF16(1.0) - jnp.abs(dh), BF16(0.0))
                a_lo = jnp.maximum(BF16(1.0) - jnp.abs(dl), BF16(0.0))
                K = (_R // 8) * 128
                return total + jax.lax.dot_general(
                    a_hi.reshape(128, K), a_lo.reshape(128, K),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            def body(j, total):
                b = (x >> (8 * j)) & 0xFF
                return plane_hist(b, total)

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 4, body, jnp.zeros((128, 128), jnp.float32),
                unroll=True,
            )
        elif mode == "i8dot":
            # relu one-hot cast to int8, s8xs8->s32 MXU
            def byte_of(g, lane):
                idx = g * 2 + ((lane & 7) >> 2)
                w = jnp.take_along_axis(x, idx, axis=1)
                return (w >> ((lane & 3) * 8)) & 0xFF

            def body(g, total):
                b = byte_of(g, lane)
                dh = (b >> 4) - val
                dl = (b & 0xF) - val
                a_hi = jnp.maximum(1 - jnp.abs(dh), 0).astype(jnp.int8)
                a_lo = jnp.maximum(1 - jnp.abs(dl), 0).astype(jnp.int8)
                return total + jax.lax.dot_general(
                    a_hi, a_lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 64, body, jnp.zeros((128, 128), jnp.int32),
                unroll=unroll,
            ).astype(jnp.float32)
        elif mode == "nogather":
            # WRONG RESULT: byte taken from own lane (no replication
            # gather) — isolates the take_along_axis cost
            def body(g, total):
                b = ((x >> ((lane & 3) * 8)) & 0xFF) + g * 0
                a_hi = jnp.where((b >> 4) == val, 1.0, 0.0).astype(BF16)
                a_lo = jnp.where((b & 0xF) == val, 1.0, 0.0).astype(BF16)
                return total + jax.lax.dot_general(
                    a_hi, a_lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 64, body, jnp.zeros((128, 128), jnp.float32),
                unroll=unroll,
            )
        else:  # base
            def byte_of(g, lane):
                idx = g * 2 + ((lane & 7) >> 2)
                w = jnp.take_along_axis(x, idx, axis=1)
                return (w >> ((lane & 3) * 8)) & 0xFF

            _hist_body(byte_of, 64, acc, unroll)

        @pl.when(ch == nch - 1)
        def _():
            out_ref[...] = acc[...]

    return kern


def build(mode, unroll, W):
    chunk = _R * 128
    nch = W // chunk

    @jax.jit
    def f(x):
        xs = x.reshape(nch, _R, 128)
        return pl.pallas_call(
            functools.partial(_mk_kernel(mode, unroll), nch=nch),
            grid=(1, nch),
            in_specs=[pl.BlockSpec((None, _R, 128), lambda b, c: (c, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None, 128, 128), lambda b, c: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(xs)

    return f


def timeit(f, x, K=8):
    @jax.jit
    def chain(x, k):
        def body(i, acc):
            p = f((x ^ acc[0, 0, :1].astype(U32)))
            return p.astype(U32) + acc if False else p.astype(U32)
        # simple dependent chain: xor a scalar of prev output into input
        out = f(x)
        for _ in range(k - 1):
            out = f(x ^ out[0, 0, :1].astype(U32))
        return out

    r1 = np.asarray(jax.jit(lambda x: f(x))(x))  # warm single
    t1 = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x))[0, 0, 0]
        t1.append(time.perf_counter() - t0)
    ck = jax.jit(lambda x: chain(x, K))
    np.asarray(ck(x))[0, 0, 0]
    tk = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ck(x))[0, 0, 0]
        tk.append(time.perf_counter() - t0)
    per = (min(tk) - min(t1)) / (K - 1)
    return per, min(t1)


def main():
    W = 1 << 22  # 4Mi words = 16 MiB
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, (W,), dtype=np.uint32))
    modes = [
        ("base", 1), ("base", 4), ("base", 8),
        ("nodot", 1), ("nodot", 4),
        ("novpu", 1), ("novpu", 4),
        ("rangecmp", 4),
        ("relu", 1), ("relu", 4), ("relu", 8),
        ("nogather", 1), ("nogather", 4),
        ("slabval", 1), ("i8dot", 4),
    ]
    for mode, u in modes:
        f = build(mode, u, W)
        try:
            per, single = timeit(f, x)
            print(f"{mode:9s} unroll={u}: {per*1e3:7.3f} ms/call "
                  f"(single {single*1e3:.3f})", flush=True)
        except Exception as e:
            print(f"{mode:9s} unroll={u}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
