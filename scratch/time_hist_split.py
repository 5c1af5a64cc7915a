import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.ops.pallas.histogram_mxu import histogram_mxu_packed
from dietgpu_fork_tpu.ops.pallas.float_split_fused import split_hist_packed_tpu

N = 1 << 24
U32 = jnp.uint32
I32 = jnp.int32


def chain_time(f, args, K=16):
    def chain(*a):
        out = f(*a)
        for _ in range(K - 1):
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(U32)
            out = f(a[0] ^ s, *a[1:])
        return out
    def fence(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])
    fence(f(*args))
    t1 = []
    for _ in range(5):
        t0 = time.perf_counter(); fence(f(*args))
        t1.append(time.perf_counter() - t0)
    ck = jax.jit(chain)
    fence(ck(*args))
    tk = []
    for _ in range(5):
        t0 = time.perf_counter(); fence(ck(*args))
        tk.append(time.perf_counter() - t0)
    print("   t1:", [f"{v*1e3:.2f}" for v in t1])
    print("   tk:", [f"{v*1e3:.2f}" for v in tk])
    return (min(tk) - min(t1)) / (K - 1)


rng = np.random.default_rng(0)
xb = rng.integers(0, 2**32, (1, N // 4), dtype=np.uint32)
x = jnp.asarray(xb)
sizes = jnp.asarray([N], I32)
t = chain_time(lambda a, s: histogram_mxu_packed(a, s), (x, sizes))
print(f"histogram_mxu_packed 16MiB: {t*1e3:.3f} ms")

data = rng.integers(0, 2**32, (1, N // 2), dtype=np.uint32)
d = jnp.asarray(data)
n32 = jnp.asarray([N], I32)
f = jax.jit(lambda a, s: split_hist_packed_tpu(a, s, FloatType.BFLOAT16))
t = chain_time(f, (d, n32))
print(f"split_hist_packed_tpu bf16 16Mi: {t*1e3:.3f} ms")
