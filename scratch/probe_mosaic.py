"""Probe Mosaic capabilities + op costs on the v5e chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scratch/probe_mosaic.py
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
F32 = jnp.float32


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def bench(f, *args, reps=5):
    fence(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fence(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


# ---------------- probe 1: sublane take_along_axis ----------------
def probe_sublane_gather():
    def kern(op_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(op_ref[...], idx_ref[...], axis=0)

    op = jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128)
    idx = jnp.tile(jnp.arange(64, dtype=jnp.int32)[:, None] * 3 % 256, (1, 128))
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        )(op, idx)
        ref = np.take_along_axis(np.asarray(op), np.asarray(idx), axis=0)
        ok = np.array_equal(np.asarray(out), ref)
        print("sublane gather (256,128) idx(64,128):", "OK" if ok else "WRONG")
    except Exception as e:
        print("sublane gather FAILED:", str(e)[:300])


# ---------------- probe 2: MXU dot in kernel ----------------
def probe_mxu_dot():
    def kern(x_ref, m_ref, out_ref):
        x = x_ref[...].astype(F32)
        m = m_ref[...]
        r = jax.lax.dot_general(
            x, m, (((1,), (0,)), ((), ())), preferred_element_type=F32
        )
        out_ref[...] = r.astype(jnp.int32)

    x = jnp.ones((64, 128), jnp.int32)
    # segmented suffix-sum matrix: M[m,l]=1 if same 32-group and m>=l
    mm = np.zeros((128, 128), np.float32)
    for l in range(128):
        for m in range(l, (l // 32 + 1) * 32):
            mm[m, l] = 1.0
    m = jnp.asarray(mm)
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32)
        )(x, m)
        ref = np.ones((64, 128), np.int32) @ mm.astype(np.int32)
        ok = np.array_equal(np.asarray(out), ref)
        print("MXU dot (64,128)@(128,128):", "OK" if ok else "WRONG")
    except Exception as e:
        print("MXU dot FAILED:", str(e)[:300])


# ---------------- probe 3: op cost calibration ----------------
# grid of T steps; each step does OPS repetitions of one op kind on
# (G4,128) u32 kept in VMEM scratch; compare total times.
def calib_kernel_factory(kind, ops, G4):
    def kern(a_ref, t_ref, out_ref, st):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            st[...] = a_ref[...]

        x = st[...]
        t = t_ref[...]
        if kind == "add":
            for _ in range(ops):
                x = x + U32(1)
        elif kind == "mul":
            for _ in range(ops):
                x = x * U32(3) + U32(1)
        elif kind == "sel":
            for _ in range(ops):
                x = jnp.where(x > U32(7), x + U32(1), x)
        elif kind == "gather":
            idx = (x & U32(127)).astype(I32)
            for _ in range(ops):
                g = jnp.take_along_axis(t, idx, axis=1)
                x = x + g
        elif kind == "gather_dep":
            for _ in range(ops):
                idx = (x & U32(127)).astype(I32)
                x = x + jnp.take_along_axis(t, idx, axis=1)
        elif kind == "roll":
            for k in range(ops):
                x = x + pltpu.roll(x, 1 + (k % 7), 1)
        elif kind == "mxu":
            mm = t[:128, :].astype(F32)
            for _ in range(ops):
                y = jax.lax.dot_general(
                    (x & U32(31)).astype(F32), mm,
                    (((1,), (0,)), ((), ())), preferred_element_type=F32,
                )
                x = x + y.astype(U32)
        elif kind == "sub_gather":
            big = jnp.tile(t, (2, 1))  # (256,128)
            for _ in range(ops):
                idx = (x & U32(255)).astype(I32)[: big.shape[0] // 4, :]
                idx = jnp.tile(idx, (4, 1))
                g = jnp.take_along_axis(big, idx, axis=0)
                x = x + g[:G4]
        st[...] = x

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = st[...]

    return kern


def probe_costs():
    G4 = 64
    T = 128
    a = jnp.ones((G4, 128), U32)
    t = jnp.arange(128 * 128, dtype=U32).reshape(128, 128)

    for kind in ["add", "mul", "sel", "roll", "gather", "gather_dep",
                 "mxu", "sub_gather"]:
        for ops in (8, 32):
            try:
                f = jax.jit(
                    lambda a, t, kind=kind, ops=ops: pl.pallas_call(
                        calib_kernel_factory(kind, ops, G4),
                        grid=(T,),
                        in_specs=[
                            pl.BlockSpec((G4, 128), lambda j: (0, 0)),
                            pl.BlockSpec((128, 128), lambda j: (0, 0)),
                        ],
                        out_specs=pl.BlockSpec((G4, 128), lambda j: (0, 0)),
                        out_shape=jax.ShapeDtypeStruct((G4, 128), U32),
                        scratch_shapes=[pltpu.VMEM((G4, 128), U32)],
                        compiler_params=pltpu.CompilerParams(
                            dimension_semantics=("arbitrary",),
                        ),
                    )(a, t)
                )
                dt = bench(f, a, t)
                # per-op per-step time in ns
                print(f"{kind:11s} ops={ops:3d}: total {dt*1e6:8.1f} us  "
                      f"-> {dt*1e9/(T*ops):7.2f} ns/op")
            except Exception as e:
                print(f"{kind} ops={ops} FAILED: {str(e)[:200]}")
                break


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    probe_sublane_gather()
    probe_mxu_dot()
    probe_costs()
