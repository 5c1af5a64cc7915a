"""Chip probe: classic vs ROW-STREAM native float codec, 16Mi bf16.

Chained timing as bench.py. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scratch/time_native_r4.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core,
    float_decompress_core,
)

N = 1 << 24
ITERS = 6
REPEATS = 5


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chain_time(f1, fk):
    fence(f1()); fence(fk())
    t1s, tks = [], []
    for _ in range(REPEATS):
        t0 = time.time(); fence(f1()); t1s.append(time.time() - t0)
        t0 = time.time(); fence(fk()); tks.append(time.time() - t0)
    return max((min(tks) - min(t1s)) / (ITERS - 1), 1e-9)


def main():
    rng = np.random.default_rng(0)
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
    data32 = jnp.asarray(w.view(np.uint32).reshape(1, -1))
    sizes = jnp.array([N], jnp.int32)
    raw_gb = 2 * N / 1e9

    for native in (False, True):
        def enc(d):
            return float_compress_core(
                d, sizes, FloatType.BFLOAT16, prob_bits=10, native=native
            )

        def dec(c):
            return float_decompress_core(
                c, jnp.zeros((1,), jnp.int32), N, FloatType.BFLOAT16,
                prob_bits=10, native=native,
            )

        def enc_chain(k):
            @jax.jit
            def f(d):
                out = None
                for i in range(k):
                    out = enc(d)
                    d = d.at[:, :1].set(d[:, :1] ^ out[0][:, :1] ^ jnp.uint32(i))
                return out
            return lambda: f(data32)

        comp32, comp_bytes = jax.jit(enc)(data32)
        comp32 = jnp.array(np.asarray(comp32))

        def dec_chain(k):
            @jax.jit
            def f(c):
                out = None
                for i in range(k):
                    out = dec(c)
                    c = c.at[:, -1:].set(out[0][:, :1] + jnp.uint32(i))
                return out
            return lambda: f(comp32)

        out = jax.jit(dec)(comp32)
        ok = np.array_equal(
            np.asarray(out[0]).view(np.uint8)[0, : 2 * N], w.view(np.uint8)
        ) and bool(np.asarray(out[1])[0])

        t_enc = chain_time(enc_chain(1), enc_chain(ITERS))
        t_dec = chain_time(dec_chain(1), dec_chain(ITERS))
        ratio = int(np.asarray(comp_bytes)[0]) / (2 * N)
        print(
            f"native={native}: comp {1e3*t_enc:.2f} ms ({raw_gb/t_enc:.2f} GB/s), "
            f"decomp {1e3*t_dec:.2f} ms ({raw_gb/t_dec:.2f} GB/s), "
            f"ratio {ratio:.4f}, roundtrip={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
