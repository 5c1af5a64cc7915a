"""fp32 decode: two-pass vs fused (env DIETTPU_FUSED_F32 picks path)."""
import os, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core, float_decompress_core)

N = 1 << 24
rng = np.random.default_rng(7)
x32 = jnp.asarray(rng.normal(0, 1, (1, N)).astype(np.float32).view(np.uint32))
sizes = jnp.full((1,), N, jnp.int32)
comp, nbytes = jax.jit(
    lambda d, s: float_compress_core(d, s, FloatType.FLOAT32, 10))(x32, sizes)

dec = jax.jit(lambda c: float_decompress_core(
    c, jnp.zeros((1,), jnp.int32), N, FloatType.FLOAT32, 10))

def fence(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])

out = dec(comp)
assert np.array_equal(np.asarray(out[0])[:, :N], np.asarray(x32)), "mismatch"
K = 8
def chain(c):
    o = dec(c)
    for _ in range(K - 1):
        # real data dependency: xor an output word into trailing padding
        c = c.at[:, -1].set(c[:, -1] ^ o[0].ravel()[0])
        o = dec(c)
    return o
ck = jax.jit(chain)
fence(ck(comp))
t1, tk = [], []
for _ in range(5):
    t0 = time.perf_counter(); fence(dec(comp)); t1.append(time.perf_counter()-t0)
    t0 = time.perf_counter(); fence(ck(comp)); tk.append(time.perf_counter()-t0)
per = (min(tk) - min(t1)) / (K - 1)
mode = "fused" if os.environ.get("DIETTPU_FUSED_F32") == "1" else "two-pass"
print(f"fp32 16Mi decomp [{mode}]: {per*1e3:.3f} ms ({N*4/per/1e9:.2f} GB/s)")
