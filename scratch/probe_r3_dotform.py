"""Which dot_general orientation is fastest on v5e for the histogram shapes?

All variants run 64 dots per grid invocation x 32 invocations over constant
bf16 operands resident in VMEM, f32 accumulation (same MAC count as the
16 MiB histogram: 34.4G MACs). Reported ms/call isolates MXU+form cost.

  T   : (1024,128)^T @ (1024,128)  contract dim0/dim0   (current histogram)
  N   : (128,1024)   @ (1024,128)  contract dim1/dim0   (native form)
  NT  : (128,1024)   @ (128,1024)^T contract dim1/dim1
  T512: T-form at K=512, 128 dots  (does K matter?)
  T2k : T-form at K=2048, 32 dots

Run: PYTHONPATH=/root/repo:/root/.axon_site python scratch/probe_r3_dotform.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BF16 = jnp.bfloat16


def mk(form):
    if form == "T":
        sa, sb, dn, n = (1024, 128), (1024, 128), (((0,), (0,)), ((), ())), 64
    elif form == "N":
        sa, sb, dn, n = (128, 1024), (1024, 128), (((1,), (0,)), ((), ())), 64
    elif form == "NT":
        sa, sb, dn, n = (128, 1024), (128, 1024), (((1,), (1,)), ((), ())), 64
    elif form == "T512":
        sa, sb, dn, n = (512, 128), (512, 128), (((0,), (0,)), ((), ())), 128
    elif form == "T2k":
        sa, sb, dn, n = (2048, 128), (2048, 128), (((0,), (0,)), ((), ())), 32
    else:
        raise ValueError(form)

    def kern(a_ref, b_ref, out_ref, acc):
        ch = pl.program_id(0)

        @pl.when(ch == 0)
        def _():
            acc[...] = jnp.zeros((128, 128), jnp.float32)

        a = a_ref[...]
        b = b_ref[...]

        def body(g, total):
            # perturb OPERANDS with g so the dot cannot be hoisted
            gf = (g * 1e-9).astype(BF16)
            ag = a + gf
            bg = b + gf
            return total + jax.lax.dot_general(
                ag, bg, dn, preferred_element_type=jnp.float32)

        acc[...] = acc[...] + jax.lax.fori_loop(
            0, n, body, jnp.zeros((128, 128), jnp.float32), unroll=False)

        @pl.when(ch == 31)
        def _():
            out_ref[...] = acc[...]

    @jax.jit
    def f(a, b):
        return pl.pallas_call(
            kern,
            grid=(32,),
            in_specs=[
                pl.BlockSpec(sa, lambda c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(sb, lambda c: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((128, 128), lambda c: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(a, b)

    return f, sa, sb


def timeit(f, a, b, K=8):
    def chain(a, b):
        out = f(a, b)
        for _ in range(K - 1):
            out = f(a * (1 + 0 * out[:1, :1].astype(BF16)), b)
        return out

    np.asarray(f(a, b))
    t1 = []
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(f(a, b))
        t1.append(time.perf_counter() - t0)
    ck = jax.jit(chain)
    np.asarray(ck(a, b))
    tk = []
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(ck(a, b))
        tk.append(time.perf_counter() - t0)
    return (min(tk) - min(t1)) / (K - 1), min(t1)


def main():
    rng = np.random.default_rng(0)
    for form in ("T", "N", "NT", "T2k"):
        f, sa, sb = mk(form)
        a = jnp.asarray(rng.standard_normal(sa), BF16)
        b = jnp.asarray(rng.standard_normal(sb), BF16)
        try:
            per, single = timeit(f, a, b)
            print(f"{form:5s}: {per*1e3:7.3f} ms per 34.4G MACs "
                  f"({34.4/per/1e3:6.1f} T MAC/s)", flush=True)
        except Exception as e:
            print(f"{form:5s}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
