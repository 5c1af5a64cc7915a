"""r4 decode ablation (native path, 16Mi bf16): where do 3.1 ms go?

Stages: raw-section block-major merge | parse+stage | fused kernel alone |
kernel+joins glue | full. Pre-stages kernel inputs once (device), then
chains each cut.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core, float_decompress_core, _section_word_counts,
)
from dietgpu_fork_tpu.models.ans import _ans_parse_and_stage
from dietgpu_fork_tpu.ops.table import build_decode_tables_split
from dietgpu_fork_tpu.ops.pallas.merge import runs_merge
from dietgpu_fork_tpu.ops.pallas.rans_decode_fused2 import decode_join16_fused
from dietgpu_fork_tpu.ops.checksum import mask_packed_bytes

N = 1 << 24
NB = N // 4096
ITERS = 6
I32, U32 = jnp.int32, jnp.uint32


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chain(build):
    f1, fk = build(1), build(ITERS)
    fence(f1()); fence(fk())
    t1s, tks = [], []
    for _ in range(4):
        t0 = time.time(); fence(f1()); t1s.append(time.time() - t0)
        t0 = time.time(); fence(fk()); tks.append(time.time() - t0)
    return max((min(tks) - min(t1s)) / (ITERS - 1), 1e-9)


def chained(fn, data):
    def make(k):
        @jax.jit
        def f(*args):
            a0 = args[0]
            out = None
            for i in range(k):
                out = fn(a0, *args[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                a0 = a0.at[(0,) * a0.ndim].set(
                    a0[(0,) * a0.ndim] ^ leaf.reshape(-1)[:1][0].astype(a0.dtype)
                    ^ a0.dtype.type(i)
                )
            return out
        return lambda: f(*data)
    return make


def main():
    rng = np.random.default_rng(0)
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16
         ).astype(np.uint16)
    data32 = jnp.asarray(w.view(np.uint32).reshape(1, -1))
    sizes = jnp.array([N], I32)
    ft = FloatType.BFLOAT16

    comp32, _ = jax.jit(
        lambda d: float_compress_core(d, sizes, ft, 10, native=True)
    )(data32)
    comp32 = jnp.array(np.asarray(comp32))
    s1w, s2w = (int(np.asarray(x)[0]) for x in _section_word_counts(sizes, ft))
    ans_base = jnp.full((1,), 8 + s1w + s2w, I32)

    # (1) raw merge alone
    def raw_merge(c):
        b_ar = jnp.arange(1, dtype=I32)
        CW = c.shape[1]
        return runs_merge(
            c.reshape(-1), b_ar * (NB * 1024), b_ar * CW + 8,
            jnp.full((1,), min(s1w, NB * 1024), I32), NB * 1024
        ).reshape(1, NB, 1024)
    t_raw = chain(chained(raw_merge, (comp32,)))
    print(f"raw32 merge: {1e3*t_raw:.2f} ms", flush=True)

    # pre-stage kernel inputs
    @jax.jit
    def stage(c):
        streams, comp_w, uncomp_w, states, pdf, success, n, csum, NB_ = (
            _ans_parse_and_stage(c, ans_base, N, None, 10, native=True)
        )
        sym4, symtab = build_decode_tables_split(pdf, 10)
        return streams, comp_w, uncomp_w, states, sym4, symtab
    staged = [jnp.array(np.asarray(x)) for x in stage(comp32)]
    raw32 = jnp.array(np.asarray(jax.jit(raw_merge)(comp32)))

    # (2) fused kernel alone
    def kern(streams, cw, uw, st, s4, stab, raw):
        return decode_join16_fused(
            streams, cw, uw, st, s4, stab, raw, 10, True, row_stream=True
        )
    def make_kern(k):
        @jax.jit
        def f(streams, *rest):
            out = None
            for i in range(k):
                out = kern(streams, *rest)
                streams = streams.at[0, 0, 0].set(
                    streams[0, 0, 0] ^ out.reshape(-1)[:1][0] ^ U32(i)
                )
            return out
        a = (staged[0], staged[1], staged[2], staged[3], staged[4],
             staged[5], raw32)
        return lambda: f(*a)
    t_kern = chain(make_kern)
    print(f"fused join16 kernel alone: {1e3*t_kern:.2f} ms", flush=True)

    # (3) kernel + output mask glue
    def make_kern_mask(k):
        @jax.jit
        def f(streams, *rest):
            out = None
            for i in range(k):
                o = kern(streams, *rest)
                out = mask_packed_bytes(
                    o.reshape(1, NB * 2048)[:, : N // 2], sizes * 2
                )
                streams = streams.at[0, 0, 0].set(
                    streams[0, 0, 0] ^ out.reshape(-1)[:1][0] ^ U32(i)
                )
            return out
        a = (staged[0], staged[1], staged[2], staged[3], staged[4],
             staged[5], raw32)
        return lambda: f(*a)
    t_km = chain(make_kern_mask)
    print(f"kernel + reshape/mask: {1e3*t_km:.2f} ms", flush=True)

    # (4) full
    def full(c):
        return float_decompress_core(
            c, jnp.zeros((1,), I32), N, ft, 10, native=True
        )
    t_full = chain(chained(full, (comp32,)))
    print(f"full decompress: {1e3*t_full:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
