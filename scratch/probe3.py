"""Probe: dynamic sublane-offset VMEM ref loads/stores (for a fast
block-staging kernel to replace the runs-merge on the decode path)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32


def probe_dyn_rows():
    # load (8,128) at traced row offset from a (256,128) VMEM ref, store at
    # a different traced row offset into a (256,128) scratch, then dump.
    def kern(x_ref, off_ref, out_ref, scr):
        scr[...] = jnp.zeros((256, 128), I32)

        def body(i, _):
            r0 = off_ref[2 * i]
            r1 = off_ref[2 * i + 1]
            v = x_ref[pl.ds(r0, 8), :]
            scr[pl.ds(r1, 8), :] = v + i
            return 0

        jax.lax.fori_loop(0, 4, body, 0, unroll=False)
        out_ref[...] = scr[...]

    x = jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128)
    offs = jnp.array([3, 0, 40, 16, 100, 64, 200, 128], jnp.int32)
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((256, 128), I32)],
        )(x, offs)
        out = np.asarray(out)
        ref = np.zeros((256, 128), np.int32)
        o = np.asarray(offs)
        for i in range(4):
            ref[o[2 * i + 1] : o[2 * i + 1] + 8] = (
                np.asarray(x)[o[2 * i] : o[2 * i] + 8] + i
            )
        print("dyn row load+store:", "OK" if np.array_equal(out, ref)
              else "WRONG")
    except Exception as e:
        print("dyn row load/store FAILED:", repr(e)[:400])


def probe_dyn_rows_unaligned():
    # offsets not multiples of 8
    def kern(x_ref, off_ref, out_ref, scr):
        scr[...] = jnp.zeros((256, 128), I32)

        def body(i, _):
            r0 = off_ref[2 * i]
            r1 = off_ref[2 * i + 1]
            v = x_ref[pl.ds(r0, 12), :]
            scr[pl.ds(r1, 12), :] = v
            return 0

        jax.lax.fori_loop(0, 4, body, 0, unroll=False)
        out_ref[...] = scr[...]

    x = jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128)
    offs = jnp.array([5, 1, 41, 17, 101, 65, 201, 130], jnp.int32)
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((256, 128), I32)],
        )(x, offs)
        out = np.asarray(out)
        ref = np.zeros((256, 128), np.int32)
        o = np.asarray(offs)
        for i in range(4):
            ref[o[2 * i + 1] : o[2 * i + 1] + 12] = np.asarray(x)[
                o[2 * i] : o[2 * i] + 12
            ]
        print("dyn row UNALIGNED load+store:",
              "OK" if np.array_equal(out, ref) else "WRONG")
    except Exception as e:
        print("dyn row unaligned FAILED:", repr(e)[:400])


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe_dyn_rows()
    probe_dyn_rows_unaligned()
