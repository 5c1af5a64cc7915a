"""Break down ans_decode_core: merge staging vs decode kernel, and try G."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.models.ans import ans_encode_core
from dietgpu_fork_tpu.ops.bitops import bitcast_u8_to_u32
from dietgpu_fork_tpu.ops.rans_encode import MAX_BLOCK_WORDS32
from dietgpu_fork_tpu.ops.table import build_decode_tables_split
from dietgpu_fork_tpu.ops.pallas.merge import runs_merge
import dietgpu_fork_tpu.ops.pallas.rans_decode_fused2 as rdf2

I32 = jnp.int32
U32 = jnp.uint32
N = 1 << 24
ITERS = 6


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


def main():
    rng = np.random.default_rng(7)
    w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16).astype(
        np.uint16)
    exp = ((w >> 7) & 0xFF).astype(np.uint8)
    x32 = bitcast_u8_to_u32(jnp.asarray(exp.reshape(1, -1)))
    sizes = jnp.array([N], I32)

    # encode once, build staged inputs on host
    from dietgpu_fork_tpu.ops.histogram import histogram_packed
    from dietgpu_fork_tpu.ops.table import (
        normalize_probs_batched, pack_encode_table)
    from dietgpu_fork_tpu.ops.rans_encode import encode_blocks

    hist = jax.jit(histogram_packed)(x32, sizes)
    pdf, cdf, magic, shift = jax.jit(
        lambda h, s: normalize_probs_batched(h, s, 10))(hist, sizes)
    packed = pack_encode_table(pdf, cdf, shift)
    states, streams32, num_words = jax.jit(
        lambda x, s: encode_blocks(x, s, packed, magic, 10))(x32, sizes)

    NB = states.shape[1]
    SW = -(-(MAX_BLOCK_WORDS32 + 8) // 32) * 32
    cw = np.asarray(num_words).astype(np.int32)
    uw = np.full((1, NB), 4096, np.int32)
    # build end-aligned staging on host
    st_src = np.asarray(streams32)
    ea = np.zeros((1, NB, SW), np.uint32)
    for k in range(NB):
        n32 = (int(cw[0, k]) + 1) >> 1
        ea[0, k, SW - n32:] = st_src[0, k, :n32]
    ea = jnp.asarray(ea)
    cw_d = jnp.asarray(cw)
    uw_d = jnp.asarray(uw)
    st_d = jnp.asarray(np.asarray(states))
    sym4, symtab = jax.jit(
        lambda p: build_decode_tables_split(p, 10))(pdf)
    sym4 = jnp.asarray(np.asarray(sym4))
    symtab = jnp.asarray(np.asarray(symtab))

    # decode kernel alone at various G
    for G in (256, 512, 1024):
        rdf2._pick_g = lambda NB, G=G: G if NB >= G else max(
            8, -(-NB // 8) * 8)
        try:
            def build(k):
                @jax.jit
                def f(ea_):
                    out = None
                    for i in range(k):
                        out = rdf2.decode_blocks_fused2(
                            ea_, cw_d, uw_d, st_d, sym4, symtab, 10)
                        ea_ = ea_.at[:, 0, :1].set(out[:, 0, :1] + U32(i))
                    return out
                return lambda: f(ea)
            dt = chain(build)
            out = jax.jit(lambda e: rdf2.decode_blocks_fused2(
                e, cw_d, uw_d, st_d, sym4, symtab, 10))(ea)
            ok = np.array_equal(
                np.asarray(out).reshape(-1)[:N // 4],
                np.asarray(x32).reshape(-1)[:N // 4])
            print(f"decode kernel G={G}: {dt*1e3:7.3f} ms "
                  f"{N/dt/1e9:6.2f} GB/s ok={ok}", flush=True)
        except Exception as e:
            print(f"G={G} FAILED: {repr(e)[:200]}", flush=True)

    # merge2 alone (end-aligned staging from a fake archive layout)
    flat = jnp.asarray(
        rng.integers(0, 2**32, 1 << 21, dtype=np.uint64).astype(np.uint32))
    r_flat = np.arange(NB, dtype=np.int32)
    len2 = ((cw[0] + 1) >> 1).astype(np.int32)
    dst2 = (r_flat * SW + (SW - len2)).astype(np.int32)
    src2 = (np.cumsum(len2) - len2).astype(np.int32)
    dst_d, src_d, len_d = map(jnp.asarray, (dst2, src2, len2))

    def build(k):
        @jax.jit
        def f(fl):
            out = None
            for i in range(k):
                out = runs_merge(fl, dst_d, src_d, len_d, NB * SW)
                fl = fl.at[:1].set(out[:1] + U32(i))
            return out
        return lambda: f(flat)
    dt = chain(build)
    print(f"merge2 ({NB} pieces): {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
