"""Bisect sparse_float_compress_core (fp16 15M, 50% zeros)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models import sparse as SP
from dietgpu_fork_tpu.models.float_codec import float_compress_core
from dietgpu_fork_tpu.ops.pallas.sparse_stream import bitrev8_words, compact_by_bitmap

I32, U32 = jnp.int32, jnp.uint32
N = 15_000_000
ft = FloatType.FLOAT16

rng = np.random.default_rng(7)
x = rng.normal(0, 1, N)
x[rng.random(N) < 0.5] = 0.0
w = x.astype(np.float16).view(np.uint16)
w = np.pad(w, (0, N % 2))
data32 = jnp.asarray(w.view(np.uint32)[None, :])
n = jnp.full((1,), N, I32)
W32 = data32.shape[1]
S_cap = SP._floats_capacity(W32, ft)


def fence(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])


def chain_time(f, x, K=6):
    def chain(x):
        o = f(x)
        s = jax.tree_util.tree_leaves(o)[0].ravel()[0].astype(U32)
        for _ in range(K - 1):
            o = f(x.at[:, -1].set(x[:, -1] ^ s))
            s = jax.tree_util.tree_leaves(o)[0].ravel()[0].astype(U32)
        return o
    fence(f(x)); ck = jax.jit(chain); fence(ck(x))
    t1, tk = [], []
    for _ in range(4):
        t0 = time.perf_counter(); fence(f(x)); t1.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); fence(ck(x)); tk.append(time.perf_counter()-t0)
    return (min(tk) - min(t1)) / (K - 1)


@jax.jit
def sA(d):  # bitmap pack
    bm = SP._pack_bitmap_direct(d, n, S_cap, ft)
    return bm[0, -1] ^ bm[0, 0], bm

@jax.jit
def sB(d):  # + compact
    bm = SP._pack_bitmap_direct(d, n, S_cap, ft)
    packed, nnz = compact_by_bitmap(d, bitrev8_words(bm), S_cap, pair=0)
    return packed[0, -1] ^ nnz[0].astype(U32), packed

@jax.jit
def sC(d):  # + dense codec on the compacted stream
    bm = SP._pack_bitmap_direct(d, n, S_cap, ft)
    packed, nnz = compact_by_bitmap(d, bitrev8_words(bm), S_cap, pair=0)
    packed = packed[:, : -(-S_cap * 2 // 4)]
    dense32, dense_bytes = float_compress_core(packed, nnz, ft, 9)
    return dense_bytes[0], dense32

@jax.jit
def sD(d):  # full
    return SP.sparse_float_compress_core(d, n, ft, 9)

for name, f in (("A bitmap", sA), ("B +compact", sB),
                ("C +dense", sC), ("D full", sD)):
    print(f"{name:12s}: {chain_time(f, data32)*1e3:7.3f} ms", flush=True)
