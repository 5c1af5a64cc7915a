"""r5: time the native-mode encode pieces at 16 MiB on chip.

PYTHONPATH=/root/repo:/root/.axon_site python scratch/enc_parts_r5.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.ops.table import normalize_probs_batched, pack_encode_table
from dietgpu_fork_tpu.ops.histogram import histogram_packed
from dietgpu_fork_tpu.ops.pallas.rans_encode_fused import encode_blocks_fused
from dietgpu_fork_tpu.models.ans import ans_encode_sections

I32, U32 = jnp.int32, jnp.uint32
N = 1 << 24  # bytes

rng = np.random.default_rng(0)
raw = np.minimum(rng.exponential(6.0, N).astype(np.int64), 255).astype(np.uint8)
x32 = jnp.asarray(raw.view(np.uint32)[None, :])
sizes = jnp.asarray([N], I32)

hist = histogram_packed(x32, sizes)
hist = jnp.asarray(np.asarray(hist))


def fence(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])


def chain_time(f, x, K=8, reps=4):
    def chain(x):
        out = f(x)
        for i in range(K - 1):
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(U32)
            out = f(x ^ (s ^ jnp.uint32(i)))
        return out
    f1 = jax.jit(f)
    ck = jax.jit(chain)
    fence(f1(x)); fence(ck(x))
    t1, tk = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); fence(f1(x)); t1.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); fence(ck(x)); tk.append(time.perf_counter()-t0)
    return (min(tk) - min(t1)) / (K - 1)


def tables(a):
    h = histogram_packed(a, sizes)
    pdf, cdf, magic, shift = normalize_probs_batched(h, sizes, 10)
    return pack_encode_table(pdf, cdf, shift), magic

print(f"hist+tables         : {chain_time(tables, x32)*1e3:7.3f} ms", flush=True)

pdf, cdf, magic, shift = normalize_probs_batched(hist, sizes, 10)
pt = jnp.asarray(np.asarray(pack_encode_table(pdf, cdf, shift)))
mt = jnp.asarray(np.asarray(magic))

def tables_only(h):
    pdf, cdf, magic, shift = normalize_probs_batched(h, sizes, 10)
    return pack_encode_table(pdf, cdf, shift), magic

print(f"tables from hist    : {chain_time(tables_only, hist)*1e3:7.3f} ms", flush=True)

enc_nat = lambda a: encode_blocks_fused(a, sizes, pt, mt, 10, native=True)
enc_cls = lambda a: encode_blocks_fused(a, sizes, pt, mt, 10)
print(f"encode fused native : {chain_time(enc_nat, x32)*1e3:7.3f} ms", flush=True)
print(f"encode fused classic: {chain_time(enc_cls, x32)*1e3:7.3f} ms", flush=True)

def sections(a):
    parts = ans_encode_sections(a, sizes, 10, s_bytes=N, hist=hist, native=True)
    return parts[1][0], parts[5]

print(f"sections (native)   : {chain_time(sections, x32)*1e3:7.3f} ms", flush=True)
