"""Validate the fused split-pass checksum against checksum_packed."""
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FLOAT_WORD_SIZE, FloatType
from dietgpu_fork_tpu.ops.checksum import checksum_packed
from dietgpu_fork_tpu.ops.float_split import split_hist_packed
from dietgpu_fork_tpu.models.float_codec import (
    float_compress_core, float_decompress_core)

I32 = jnp.int32

rng = np.random.default_rng(9)
fails = 0
for ftname, ns in [("BFLOAT16", (4096, 12345)), ("FLOAT16", (1, 100000)),
                   ("FLOAT32", (257, 65536)), ("FLOAT64", (1000, 4097))]:
    ft = FloatType[ftname]
    ws = FLOAT_WORD_SIZE[ft]
    for n in ns:
        W32 = -(-(n * ws) // 4)
        req = {2: 2, 4: 4, 8: 8}[ws]
        W32p = -(-W32 // req) * req
        d = rng.integers(0, 2**32, (2, W32p), dtype=np.uint64).astype(
            np.uint32)
        d32 = jnp.asarray(d)
        nn = jnp.full((2,), n, I32)
        _, _, _, cs = jax.jit(
            lambda x: split_hist_packed(x, nn, ft))(d32)
        want = jax.jit(lambda x: checksum_packed(x, nn * ws))(d32)
        if not np.array_equal(np.asarray(cs), np.asarray(want)):
            fails += 1
            print(f"FAIL {ftname} n={n}: {np.asarray(cs)} != "
                  f"{np.asarray(want)}", flush=True)

# end-to-end checksum verify through the codec
for ftname in ("BFLOAT16", "FLOAT32"):
    ft = FloatType[ftname]
    ws = FLOAT_WORD_SIZE[ft]
    n = 30000
    w = (rng.normal(0, 1, (1, n * ws // 4 + 4)) * 2**30).astype(np.int64)
    W32 = -(-(n * ws) // 4)
    W32p = -(-W32 // ws) * ws
    d32 = jnp.asarray(
        rng.integers(0, 2**16, (1, W32p), dtype=np.uint64).astype(np.uint32))
    nn = jnp.full((1,), n, I32)
    comp, cb = jax.jit(lambda x: float_compress_core(
        x, nn, ft, 10, use_checksum=True))(d32)
    out = jax.jit(lambda c: float_decompress_core(
        c, jnp.zeros((1,), I32), n, ft, 10, verify_checksum=True))(comp)
    arch_cs, got_cs = np.asarray(out[3]), np.asarray(out[4])
    if not (np.asarray(out[1]).all() and np.array_equal(arch_cs, got_cs)):
        fails += 1
        print(f"FAIL e2e {ftname}: arch={arch_cs} got={got_cs}", flush=True)

print(f"checksum fusion: {'ALL PASS' if fails == 0 else f'{fails} FAILURES'}",
      flush=True)
