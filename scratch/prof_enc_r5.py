"""Capture a profiler trace of one native float compress at 16Mi bf16."""
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models.float_codec import float_compress_core
from dietgpu_fork_tpu.utils.profiling import trace

N = 1 << 24
rng = np.random.default_rng(0)
w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
data32 = jnp.asarray(w.view(np.uint32).reshape(1, -1))
sizes = jnp.array([N], jnp.int32)

f = jax.jit(lambda d: float_compress_core(d, sizes, FloatType.BFLOAT16, 10, native=True))
out = f(data32)
np.asarray(out[0][0, :1])
with trace("/tmp/tb_enc"):
    for _ in range(3):
        out = f(data32)
        np.asarray(out[0][0, :1])
print("done")
