"""Stage-level profiling of the bf16 codec path on the real chip."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import BLOCK_SIZE, FloatType
from dietgpu_fork_tpu.ops.histogram import histogram_batched
from dietgpu_fork_tpu.ops.table import (
    build_decode_table_batched, normalize_probs_batched, pack_encode_table,
)
from dietgpu_fork_tpu.ops.float_split import split_words32
from dietgpu_fork_tpu.ops.rans_encode import encode_blocks
from dietgpu_fork_tpu.ops.rans_decode import decode_blocks
from dietgpu_fork_tpu.models.ans import ans_encode_core
from dietgpu_fork_tpu.models.float_codec import float_compress_core

N = 1 << 24
B = 1


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timed(name, f, *args, iters=3):
    r = f(*args); fence(r)
    t0 = time.time(); fence(f(*args)); t1 = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    fence(r)
    tm = (time.time() - t0 - t1) / (iters - 1)
    gbps = 2 * N / 1e9 / max(tm, 1e-9)
    print(f"{name:28s} {tm*1e3:9.2f} ms   {gbps:8.2f} GB/s-of-input")
    return r


rng = np.random.default_rng(0)
w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
data32 = jnp.asarray(w.view(np.uint32).reshape(B, -1))
sizes = jnp.full((B,), N, jnp.int32)

split = jax.jit(lambda d: split_words32(d, N, FloatType.BFLOAT16))
(planes, noncomp) = timed("split", split, data32)
x_u8 = planes[0]

hist = jax.jit(lambda x, s: histogram_batched(x, s))
h = timed("histogram", hist, x_u8, sizes)

norm = jax.jit(lambda h, s: normalize_probs_batched(h, s, 10))
pdf, cdf, magic, shift = timed("normalize", norm, h, sizes)

packed = pack_encode_table(pdf, cdf, shift)

NB = -(-N // BLOCK_SIZE)
enc = jax.jit(lambda x, s, p, m: encode_blocks(x, s, p, m, 10))
states, streams32, num_words = timed("encode_blocks(scan+sort)", enc, x_u8, sizes, packed, magic)

full_enc = jax.jit(lambda x, s: ans_encode_core(x, s, 10))
timed("ans_encode_core total", full_enc, x_u8, sizes)

fc = jax.jit(lambda d, s: float_compress_core(d, s, FloatType.BFLOAT16, 10))
timed("float_compress total", fc, data32, sizes)

# ---- decode side
lut = build_decode_table_batched(pdf, 10)
comp_words = num_words
uw = jnp.full((B, NB), BLOCK_SIZE, jnp.int32)
dec = jax.jit(lambda st, cw, u, s, l: decode_blocks(st, cw, u, s, l, 10))
timed("decode_blocks(scan)", dec, streams32, comp_words, uw, states, lut)

dtab = jax.jit(lambda p: build_decode_table_batched(p, 10))
timed("decode_table", dtab, pdf)
