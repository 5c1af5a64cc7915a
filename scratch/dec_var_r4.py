"""Interleaved decoder-variant A/B at 16Mi bf16 (native row-stream).

Variants share one staged input; each is chain-jitted once, then timing
samples are taken ROUND-ROBIN so chip contention hits all variants
equally. Variants: narrow/wide lookup x G(256/512) x FAST(3/2).
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core, _section_word_counts,
)
from dietgpu_fork_tpu.models.ans import _ans_parse_and_stage
from dietgpu_fork_tpu.ops.table import build_decode_tables_ranked
from dietgpu_fork_tpu.ops.pallas.merge import runs_merge
import dietgpu_fork_tpu.ops.pallas.rans_decode_fused2 as rdf

N = 1 << 24
NB = N // 4096
ITERS = 6
ROUNDS = 6
I32, U32 = jnp.int32, jnp.uint32


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


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

    @jax.jit
    def stage(c):
        streams, comp_w, uncomp_w, states, pdf, success, n, csum, NB_ = (
            _ans_parse_and_stage(c, ans_base, N, None, 10, native=True)
        )
        s4, stab, big = build_decode_tables_ranked(pdf, 10)
        return streams, comp_w, uncomp_w, states, s4, stab
    staged = [jnp.array(np.asarray(x)) for x in stage(comp32)]

    def raw_merge(c):
        b_ar = jnp.arange(1, dtype=I32)
        CW = c.shape[1]
        return runs_merge(
            c.reshape(-1), b_ar * (NB * 1024), b_ar * CW + 8,
            jnp.full((1,), min(s1w, NB * 1024), I32), NB * 1024
        ).reshape(1, NB, 1024)
    raw32 = jnp.array(np.asarray(jax.jit(raw_merge)(comp32)))
    big1 = jnp.ones((1, 1), I32)
    big0 = jnp.zeros((1, 1), I32)

    variants = {}

    def add_variant(name, big, G, fast):
        def build():
            oldg, oldf = rdf._pick_g, rdf._FAST
            rdf._pick_g = lambda nb: G if nb >= G else oldg(nb)
            rdf._FAST = fast
            try:
                def kern(streams, cw, uw, st, s4, stab, raw):
                    return rdf.decode_join16_fused.__wrapped__(
                        streams, cw, uw, st, s4, stab, raw, 10, True,
                        row_stream=True, big=big,
                    )
                @jax.jit
                def f1(streams, *rest):
                    return kern(streams, *rest)
                @jax.jit
                def fk(streams, *rest):
                    out = None
                    for i in range(ITERS):
                        out = kern(streams, *rest)
                        streams = streams.at[0, 0, 0].set(
                            streams[0, 0, 0] ^ out.reshape(-1)[:1][0]
                            ^ U32(i)
                        )
                    return out
                a = tuple(staged) + (raw32,)
                fence(f1(*a)); fence(fk(*a))
                return lambda: f1(*a), lambda: fk(*a)
            finally:
                rdf._pick_g = oldg
                rdf._FAST = oldf
        variants[name] = build()

    add_variant("narrow G256 F3", big0, 256, 3)
    add_variant("wide   G256 F3", big1, 256, 3)
    add_variant("narrow G512 F3", big0, 512, 3)
    add_variant("narrow G256 F2", big0, 256, 2)

    samples = {k: [] for k in variants}
    for r in range(ROUNDS):
        for k, (f1, fk) in variants.items():
            t0 = time.perf_counter(); fence(f1()); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); fence(fk()); tk = time.perf_counter() - t0
            samples[k].append((t1, tk))
        time.sleep(0.2)
    for k, ss in samples.items():
        t1 = min(s[0] for s in ss)
        tk = min(s[1] for s in ss)
        print(f"{k}: {(tk - t1) / (ITERS - 1) * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
