"""Round-4 stage bisection of the native-mode float codec at 16Mi bf16.

Each stage cut is a chained jit (bench.py method). Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scratch/stage_r4.py
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType, BLOCK_SIZE
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core, float_decompress_core, _section_word_counts,
)
from dietgpu_fork_tpu.models.ans import (
    ans_encode_sections, _ans_parse_and_stage,
)
from dietgpu_fork_tpu.ops.float_split import split_hist_packed
from dietgpu_fork_tpu.ops.table import build_decode_tables_ranked

N = 1 << 24
ITERS = 5
I32 = jnp.int32
U32 = jnp.uint32
NATIVE = True


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def chain_time(make_f):
    f1, fk = make_f(1), make_f(ITERS)
    fence(f1()); fence(fk())
    t1s, tks = [], []
    for _ in range(4):
        t0 = time.time(); fence(f1()); t1s.append(time.time() - t0)
        t0 = time.time(); fence(fk()); tks.append(time.time() - t0)
    return max((min(tks) - min(t1s)) / (ITERS - 1), 1e-9)


def chained(fn, data):
    def make(k):
        @jax.jit
        def f(d):
            out = None
            for i in range(k):
                out = fn(d)
                leaf = jax.tree_util.tree_leaves(out)[0]
                d = d.at[:, :1].set(
                    d[:, :1] ^ leaf.reshape(-1)[:1].astype(U32) ^ jnp.uint32(i)
                )
            return out
        return lambda: f(data)
    return make


def main():
    rng = np.random.default_rng(0)
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16
         ).astype(np.uint16)
    data32 = jnp.asarray(w.view(np.uint32).reshape(1, -1))
    sizes = jnp.array([N], I32)

    ft = FloatType.BFLOAT16

    # -- compress cuts ----------------------------------------------------
    def cut_split(d):
        planes, noncomp, hists, csum = split_hist_packed(d, sizes, ft)
        return planes[0], noncomp[0], hists[0]

    def cut_sections(d):
        planes, noncomp, hists, csum = split_hist_packed(d, sizes, ft)
        parts = ans_encode_sections(
            planes[0], sizes, 10, s_bytes=N, hist=hists[0], native=NATIVE
        )
        return parts[1][0], noncomp[0]  # stream staging ref + raw

    def cut_full(d):
        return float_compress_core(d, sizes, ft, 10, native=NATIVE)

    t_split = chain_time(chained(cut_split, data32))
    t_sect = chain_time(chained(cut_sections, data32))
    t_full = chain_time(chained(cut_full, data32))
    print(f"compress: split+hist {1e3*t_split:.2f} | +encode(sections) "
          f"{1e3*t_sect:.2f} | full {1e3*t_full:.2f} ms "
          f"(encode {1e3*(t_sect-t_split):.2f}, merge+glue "
          f"{1e3*(t_full-t_sect):.2f})", flush=True)

    # -- decompress cuts --------------------------------------------------
    comp32, _ = jax.jit(
        lambda d: float_compress_core(d, sizes, ft, 10, native=NATIVE)
    )(data32)
    comp32 = jnp.array(np.asarray(comp32))
    s1w, s2w = _section_word_counts(sizes, ft)
    ans_base = jnp.zeros((1,), I32) + 8 + s1w + s2w

    def cut_parse(c):
        streams, comp_w, uncomp_w, states, pdf, success, n, csum, NB = (
            _ans_parse_and_stage(c, ans_base, N, None, 10, native=NATIVE)
        )
        return streams, states

    def cut_parse_tab(c):
        streams, comp_w, uncomp_w, states, pdf, success, n, csum, NB = (
            _ans_parse_and_stage(c, ans_base, N, None, 10, native=NATIVE)
        )
        sym4, symtab, big = build_decode_tables_ranked(pdf, 10)
        return streams, sym4, symtab, big

    def cut_dec_full(c):
        return float_decompress_core(
            c, jnp.zeros((1,), I32), N, ft, 10, native=NATIVE
        )

    t_parse = chain_time(chained(cut_parse, comp32))
    t_ptab = chain_time(chained(cut_parse_tab, comp32))
    t_dfull = chain_time(chained(cut_dec_full, comp32))
    print(f"decompress: parse+stage {1e3*t_parse:.2f} | +tables "
          f"{1e3*t_ptab:.2f} | full {1e3*t_dfull:.2f} ms "
          f"(decode-kernel+raw+join {1e3*(t_dfull-t_ptab):.2f})", flush=True)


if __name__ == "__main__":
    main()
