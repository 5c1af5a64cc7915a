"""Time encode_blocks_fused end-to-end and its driver-glue pieces (16 MiB)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.ops.table import normalize_probs_batched, pack_encode_table
from dietgpu_fork_tpu.ops.histogram import histogram_packed
from dietgpu_fork_tpu.ops.pallas.rans_encode_fused import encode_blocks_fused
import dietgpu_fork_tpu.ops.pallas.rans_encode_fused as ref

I32, U32 = jnp.int32, jnp.uint32
N = 1 << 24  # bytes

rng = np.random.default_rng(0)
# zipf-ish byte data like an exponent plane
raw = np.minimum(rng.exponential(6.0, N).astype(np.int64), 255).astype(np.uint8)
x32 = jnp.asarray(raw.view(np.uint32)[None, :])
sizes = jnp.asarray([N], I32)

hist = histogram_packed(x32, sizes)
pdf, cdf, magic, shift = normalize_probs_batched(hist, sizes, 10)
pt = pack_encode_table(pdf, cdf, shift)
mt = magic


def fence(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])


def chain_time(f, x, K=8, reps=5):
    def chain(x):
        out = f(x)
        for _ in range(K - 1):
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(U32)
            out = f(x ^ s)
        return out
    fence(f(x))
    ck = jax.jit(chain)
    fence(ck(x))
    t1, tk = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); fence(f(x)); t1.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); fence(ck(x)); tk.append(time.perf_counter()-t0)
    return (min(tk) - min(t1)) / (K - 1)


full = jax.jit(lambda a: encode_blocks_fused(a, sizes, pt, mt, 10))
print(f"encode full         : {chain_time(full, x32)*1e3:7.3f} ms", flush=True)

# sym restage only (the phase-A input transpose)
def sym_only(a):
    B, padded_w = a.shape
    WPB = 1024
    NB = padded_w // WPB
    NB4 = -(-NB // 4) * 4
    NBF = B * NB4
    G = 256
    G4 = 64
    NBP = -(-NBF // G) * G
    CELLS = NBP // G
    xf = jnp.pad(a, ((0, 0), (0, (NB4 - NB) * WPB))).reshape(1, NBF * WPB)
    xp = jnp.pad(xf, ((0, 0), (0, (NBP - NBF) * WPB)))
    sym = (xp.reshape(CELLS, G4, 4, 32, 4, 8)
           .transpose(0, 3, 1, 2, 4, 5)
           .reshape(CELLS, 32, G4, 128))
    return sym

print(f"sym restage only    : {chain_time(jax.jit(sym_only), x32)*1e3:7.3f} ms", flush=True)
