"""Round-3 histogram probe: where does histogram_mxu_packed's time go, and
which variants beat it?

Variants (all on 16 MiB packed bytes, B=1, correctness-checked vs numpy):
  base      - current histogram_mxu_packed construction (gather + relu onehot)
  cmp       - base but compare+select one-hot (the pre-r2 construction)
  nogather  - base without the byte-distribution gather (WRONG result;
              isolates gather cost)
  nodot     - base without the MXU dots (WRONG result; isolates VPU cost)
  bcast8    - sublane-broadcast form: bytes stay one-per-lane (static plane
              extraction, no gather), replicated x16 across sublanes via a
              leading-dim broadcast; dot contracts LANES (NT matmul 128^3)
  i8dot     - base construction, int8 one-hot + s8xs8->s32 MXU

Chained-timing method from bench.py (min of K-chain minus min single).
Run: PYTHONPATH=/root/repo:/root/.axon_site python scratch/probe_r3_hist.py
"""

import functools
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


def _onehot_relu(n, valf):
    d = n.astype(BF16) - valf
    return jnp.maximum(BF16(1.0) - jnp.abs(d), BF16(0.0))


def _mk_kernel(mode, unroll):
    def kern(x_ref, out_ref, acc, *, nch):
        ch = pl.program_id(1)

        @pl.when(ch == 0)
        def _():
            acc[...] = jnp.zeros((128, 128), jnp.float32)

        x = pltpu.bitcast(x_ref[...], I32)
        lane = jax.lax.broadcasted_iota(I32, (_R, 128), 1)
        val = (lane >> 3).astype(BF16)
        vali = lane >> 3

        def byte_of(g):
            idx = g * 2 + ((lane & 7) >> 2)
            w = jnp.take_along_axis(x, idx, axis=1)
            return (w >> ((lane & 3) * 8)) & 0xFF

        if mode.startswith("wide"):
            width = int(mode[4:])

            def body(g, total):
                his, los = [], []
                for t in range(width):
                    b = byte_of(g * width + t)
                    his.append(_onehot_relu(b >> 4, val))
                    los.append(_onehot_relu(b & 0xF, val))
                a_hi = jnp.concatenate(his, axis=0)
                a_lo = jnp.concatenate(los, axis=0)
                return total + jax.lax.dot_general(
                    a_hi, a_lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 64 // width, body, jnp.zeros((128, 128), jnp.float32),
                unroll=unroll,
            )
        elif mode in ("base", "cmp", "nogather"):
            def body(g, total):
                if mode == "nogather":
                    b = ((x >> ((lane & 3) * 8)) & 0xFF) + g * 0
                else:
                    b = byte_of(g)
                if mode == "cmp":
                    a_hi = jnp.where((b >> 4) == vali, 1.0, 0.0).astype(BF16)
                    a_lo = jnp.where((b & 0xF) == vali, 1.0, 0.0).astype(BF16)
                else:
                    a_hi = _onehot_relu(b >> 4, val)
                    a_lo = _onehot_relu(b & 0xF, val)
                return total + jax.lax.dot_general(
                    a_hi, a_lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 64, body, jnp.zeros((128, 128), jnp.float32),
                unroll=unroll,
            )
        elif mode == "nodot":
            def body(g, total):
                b = byte_of(g)
                a_hi = _onehot_relu(b >> 4, val)
                a_lo = _onehot_relu(b & 0xF, val)
                return (total + a_hi.astype(jnp.float32)[:128]
                        + a_lo.astype(jnp.float32)[:128])

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 64, body, jnp.zeros((128, 128), jnp.float32),
                unroll=unroll,
            )
        elif mode == "i8dot":
            def body(g, total):
                b = byte_of(g)
                dh = (b >> 4) - vali
                dl = (b & 0xF) - vali
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
        elif mode == "bcast8":
            # bytes one-per-lane; 8 data rows per matmul, replicated x16
            # across sublanes (leading-dim broadcast = free reshape), NT
            # matmul contracting the 128 lanes. Output row (v*8 + s) ==
            # the existing _extract layout.
            val2 = (jax.lax.broadcasted_iota(I32, (128, 128), 0) >> 3
                    ).astype(BF16)

            def plane(j, total):
                def grp2(s, t):
                    b8 = jax.lax.dynamic_slice(x, (s * 8, 0), (8, 128))
                    w = (b8 >> (8 * j)) & 0xFF
                    hi = (w >> 4).astype(BF16)
                    lo = (w & 0xF).astype(BF16)
                    rh = jnp.broadcast_to(hi[None], (16, 8, 128)
                                          ).reshape(128, 128)
                    rl = jnp.broadcast_to(lo[None], (16, 8, 128)
                                          ).reshape(128, 128)
                    a_hi = jnp.maximum(BF16(1.0) - jnp.abs(rh - val2),
                                       BF16(0.0))
                    a_lo = jnp.maximum(BF16(1.0) - jnp.abs(rl - val2),
                                       BF16(0.0))
                    return t + jax.lax.dot_general(
                        a_hi, a_lo, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                return jax.lax.fori_loop(0, _R // 8, grp2, total,
                                         unroll=unroll)

            acc[...] = acc[...] + jax.lax.fori_loop(
                0, 4, plane, jnp.zeros((128, 128), jnp.float32),
                unroll=True,
            )
        else:
            raise ValueError(mode)

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
    def chain(x):
        out = f(x)
        for _ in range(K - 1):
            out = f(x ^ out[0, :1, :1].astype(U32).reshape(()))
        return out

    np.asarray(f(x))  # warm single
    t1 = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x))
        t1.append(time.perf_counter() - t0)
    ck = jax.jit(chain)
    np.asarray(ck(x))
    tk = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ck(x))
        tk.append(time.perf_counter() - t0)
    per = (min(tk) - min(t1)) / (K - 1)
    return per, min(t1)


def ref_hist(xb):
    return np.bincount(xb, minlength=256).astype(np.int64)


def extract(p):
    p4 = np.asarray(p).reshape(16, 8, 16, 8)
    return np.einsum("isjs->ij", p4).reshape(256)


def main():
    W = 1 << 22  # 4Mi words = 16 MiB
    rng = np.random.default_rng(0)
    xb = rng.integers(0, 256, (W * 4,), dtype=np.uint8)
    want = ref_hist(xb)
    x = jnp.asarray(xb.view(np.uint32))
    modes = [
        ("base", False),
        ("wide2", False), ("wide4", False), ("wide8", False),
    ]
    for mode, u in modes:
        f = build(mode, u, W)
        try:
            per, single = timeit(f, x)
            h = extract(f(x)[0])
            ok = ("OK " if np.array_equal(h, want)
                  else "showsWRONG" if mode in ("nogather", "nodot")
                  else "MISMATCH")
            print(f"{mode:9s} unroll={u!s:5s}: {per*1e3:7.3f} ms/call "
                  f"(single {single*1e3:7.3f}) {ok}", flush=True)
        except Exception as e:
            print(f"{mode:9s} unroll={u!s:5s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
