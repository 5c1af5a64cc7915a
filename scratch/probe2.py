"""Probe 2: differential op-cost calibration + sublane gather error detail."""
import functools
import time
import sys

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


def bench(f, *args, reps=6):
    fence(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fence(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


def probe_sublane_gather_verbose():
    def kern(op_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(op_ref[...], idx_ref[...], axis=0)

    op = jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128)
    idx = jnp.tile(jnp.arange(64, dtype=jnp.int32)[:, None] * 3 % 256, (1, 128))
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        )(op, idx)
        ref = np.take_along_axis(np.asarray(op), np.asarray(idx), axis=0)
        print("sublane gather idx64:", "OK" if np.array_equal(np.asarray(out), ref) else "WRONG")
    except Exception as e:
        print("sublane gather idx64 FAILED:", repr(e)[:800])

    # equal-shape variant
    idx2 = (jnp.arange(256, dtype=jnp.int32)[:, None] * 7 % 256) + jnp.zeros((1, 128), jnp.int32)
    def kern2(op_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(op_ref[...], idx_ref[...], axis=0)
    try:
        out = pl.pallas_call(
            kern2, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        )(op, idx2)
        ref = np.take_along_axis(np.asarray(op), np.asarray(idx2), axis=0)
        print("sublane gather eqshape:", "OK" if np.array_equal(np.asarray(out), ref) else "WRONG")
    except Exception as e:
        print("sublane gather eqshape FAILED:", repr(e)[:800])


def make_f(kind, ops, G4=64, T=2048):
    def kern(a_ref, t_ref, out_ref, st):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            st[...] = a_ref[...]

        x = st[...]
        tt = t_ref[...]  # (G4,128) u32 table-ish
        if kind == "add":
            for k in range(ops):
                x = x + U32(1 + k)
        elif kind == "sel":
            c = tt > U32(7)
            for k in range(ops):
                x = jnp.where(c, x + U32(k), x)
        elif kind == "cmpsel":
            for k in range(ops):
                x = jnp.where(tt > U32(k), x + U32(1), x)
        elif kind == "gather":
            idx = (tt & U32(127)).astype(I32)
            for k in range(ops):
                x = x + jnp.take_along_axis(tt, idx, axis=1)
                idx = (idx + 1) & 127
        elif kind == "gather_dep":
            for k in range(ops):
                idx = (x & U32(127)).astype(I32)
                x = x + jnp.take_along_axis(tt, idx, axis=1)
        elif kind == "roll":
            for k in range(ops):
                x = x + pltpu.roll(x, 1 + (k % 7), 1)
        elif kind == "mxu":
            mm = (tt & U32(1)).astype(I32).astype(F32)[:, :128]
            mm = jnp.broadcast_to(mm[:1], (128, 128)) if G4 != 128 else mm
            for k in range(ops):
                y = jax.lax.dot_general(
                    (x & U32(31)).astype(I32).astype(F32), mm,
                    (((1,), (0,)), ((), ())), preferred_element_type=F32,
                )
                x = x + y.astype(I32).astype(U32)
        st[...] = x

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = st[...]

    a = jnp.ones((G4, 128), U32)
    t = (jnp.arange(G4 * 128, dtype=U32).reshape(G4, 128)
         * np.uint32(2654435761)) >> 16

    f = jax.jit(
        lambda a, t: pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((G4, 128), lambda j: (0, 0)),
                pl.BlockSpec((G4, 128), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((G4, 128), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((G4, 128), U32),
            scratch_shapes=[pltpu.VMEM((G4, 128), U32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(a, t)
    )
    return lambda: f(a, t)


def probe_costs():
    T = 2048
    G4 = 64
    for kind in ["add", "sel", "cmpsel", "roll", "gather", "gather_dep", "mxu"]:
        try:
            lo, hi = 16, 128
            flo = make_f(kind, lo, G4, T)
            fhi = make_f(kind, hi, G4, T)
            tlo = bench(flo)
            thi = bench(fhi)
            per = (thi - tlo) / (T * (hi - lo))
            # cycles at 940 MHz
            print(f"{kind:11s}: lo {tlo*1e3:7.2f} ms  hi {thi*1e3:7.2f} ms"
                  f"  -> {per*1e9:7.2f} ns/op = {per*0.94e9:6.2f} cyc/op")
            sys.stdout.flush()
        except Exception as e:
            print(f"{kind} FAILED: {repr(e)[:300]}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe_sublane_gather_verbose()
    probe_costs()
