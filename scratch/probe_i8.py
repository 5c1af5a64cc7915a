"""Probe: int8 matmul + i1->i8 casts in Mosaic (for a cheaper histogram
one-hot), and bf16 vs f32 where-cost."""
import numpy as np, jax, jax.numpy as jnp, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32

def fence(x):
    return np.asarray(x.ravel()[:1])

# 1. int8 matmul
def k1(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    o_ref[...] = jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32)

try:
    a = jnp.asarray(np.random.randint(0, 2, (512, 128), np.int8))
    b = jnp.asarray(np.random.randint(0, 2, (512, 128), np.int8))
    o = pl.pallas_call(k1, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32))(a, b)
    ref = np.asarray(a).astype(np.int32).T @ np.asarray(b).astype(np.int32)
    print("i8 matmul:", "OK" if np.array_equal(np.asarray(o), ref) else "WRONG")
except Exception as e:
    print("i8 matmul FAILED:", repr(e)[:200])

# 2. compare -> int8 astype in kernel
def k2(x_ref, o_ref):
    x = x_ref[...]
    c = (x & 15) == 7
    o_ref[...] = c.astype(jnp.int8)

try:
    x = jnp.asarray(np.random.randint(0, 256, (512, 128), np.int32))
    o = pl.pallas_call(k2, out_shape=jax.ShapeDtypeStruct((512, 128), jnp.int8))(x)
    ref = ((np.asarray(x) & 15) == 7).astype(np.int8)
    print("i1->i8 cast:", "OK" if np.array_equal(np.asarray(o), ref) else "WRONG")
except Exception as e:
    print("i1->i8 cast FAILED:", repr(e)[:200])

# 3. full i8 one-hot + matmul hist step equivalent
def k3(x_ref, o_ref):
    x = x_ref[...]
    lane = jax.lax.broadcasted_iota(I32, (512, 128), 1)
    val = lane >> 3
    a_hi = ((x >> 4) == val).astype(jnp.int8)
    a_lo = ((x & 15) == val).astype(jnp.int8)
    o_ref[...] = jax.lax.dot_general(
        a_hi, a_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

try:
    x = jnp.asarray(np.random.randint(0, 256, (512, 128), np.int32))
    o = pl.pallas_call(k3, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32))(x)
    lane = np.arange(128)
    val = lane >> 3
    xa = np.asarray(x)
    ah = ((xa >> 4) == val).astype(np.int32)
    al = ((xa & 15) == val).astype(np.int32)
    print("i8 onehot+dot:", "OK" if np.array_equal(np.asarray(o), ah.T @ al) else "WRONG")
except Exception as e:
    print("i8 onehot+dot FAILED:", repr(e)[:250])
