import numpy as np
import jax.numpy as jnp
from dietgpu_fork_tpu.core.constants import FloatType
from dietgpu_fork_tpu.models import sparse as SP
from dietgpu_fork_tpu.ops.pallas.bitmap_pack import pack_bitmap16_tpu

I32 = jnp.int32
rng = np.random.default_rng(1)
for trial, (N, B) in enumerate([(100_000, 1), (8192, 3), (1_000_003, 2),
                                (31, 1), (64, 1)]):
    x = rng.normal(0, 1, (B, N))
    x[rng.random((B, N)) < 0.5] = 0
    w = x.astype(np.float16).view(np.uint16)
    w = np.pad(w, ((0, 0), (0, (-N) % 2)))
    # poison the padding to prove masking
    if N % 2:
        w[:, -1] = 0x7777
    d = jnp.asarray(w.view(np.uint32))
    n = jnp.full((B,), N, I32)
    S_cap = SP._floats_capacity(d.shape[1], FloatType.FLOAT16)
    want = np.asarray(SP._pack_bitmap_direct(d, n, S_cap, FloatType.FLOAT16))
    got = np.asarray(pack_bitmap16_tpu(d))[:, : -(-S_cap // 32)]
    # apply the orchestrator's tail mask
    wpos = np.arange(got.shape[1], dtype=np.int32)[None, :]
    r = np.clip(N - wpos * 32, 0, 32)
    fb = (r >> 3).astype(np.uint64)
    full = np.where(fb >= 4, 0xFFFFFFFF, (1 << (fb * 8)) - 1).astype(np.uint32)
    part = (((0xFF << (8 - (r & 7))) & 0xFF).astype(np.uint32)) << (fb * 8).astype(np.uint32)
    got = got & (full | np.where(r < 32, part, 0).astype(np.uint32))
    W = min(want.shape[1], got.shape[1])
    ok = np.array_equal(got[:, :W], want[:, :W]) and not want[:, W:].any() and not got[:, W:].any()
    print(f"trial {trial} N={N} B={B}: {'OK' if ok else 'MISMATCH'}", flush=True)
    assert ok, (np.flatnonzero(got[:, :W] != want[:, :W])[:5])
print("all OK")
