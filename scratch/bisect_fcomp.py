"""Bisect float_compress_core (bf16 16Mi): where do 4.8 ms go?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dietgpu_fork_tpu.core.constants import FloatType, BLOCK_SIZE
from dietgpu_fork_tpu.models import float_codec as FC
from dietgpu_fork_tpu.models.ans import ans_encode_sections
from dietgpu_fork_tpu.ops.float_split import split_hist_packed
from dietgpu_fork_tpu.ops.checksum import mask_packed_bytes
from dietgpu_fork_tpu.models.float_codec import float_compress_core

I32, U32 = jnp.int32, jnp.uint32
N = 1 << 24
ft = FloatType.BFLOAT16

rng = np.random.default_rng(7)
w = (rng.normal(0, 1, N).astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
data32 = jnp.asarray(w.view(np.uint32)[None, :])
n = jnp.full((1,), N, I32)


def fence(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[:1])


def chain_time(f, x, K=6):
    def chain(x):
        o = f(x)
        s = jax.tree_util.tree_leaves(o)[0].ravel()[0].astype(U32)
        for _ in range(K - 1):
            x2 = x.at[:, -1].set(x[:, -1] ^ s)
            o = f(x2)
            s = jax.tree_util.tree_leaves(o)[0].ravel()[0].astype(U32)
        return o
    fence(f(x)); ck = jax.jit(chain); fence(ck(x))
    t1, tk = [], []
    for _ in range(4):
        t0 = time.perf_counter(); fence(f(x)); t1.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); fence(ck(x)); tk.append(time.perf_counter()-t0)
    return (min(tk) - min(t1)) / (K - 1)


S_cap = N

@jax.jit
def stage_A(d):  # split + hist + csum
    comp_planes, noncomp, hists, csum = split_hist_packed(d, n, ft)
    return hists[0].ravel()[-1] ^ comp_planes[0][0, -1] ^ noncomp[0][0, -1], csum

@jax.jit
def stage_B(d):  # + ANS sections (hist provided)
    comp_planes, noncomp, hists, csum = split_hist_packed(d, n, ft)
    parts = ans_encode_sections(
        comp_planes[0], n, 10, use_checksum=False, s_bytes=S_cap,
        hist=hists[0])
    return parts[5], parts[0]

@jax.jit
def stage_C(d):  # + raw mask/pad + flat concat (no merge)
    comp_planes, noncomp, hists, csum = split_hist_packed(d, n, ft)
    parts = ans_encode_sections(
        comp_planes[0], n, 10, use_checksum=False, s_bytes=S_cap,
        hist=hists[0])
    sec = mask_packed_bytes(noncomp[0], n * 1)
    all_sections = [sec] + list(parts[0])
    src_flat = jnp.concatenate([s.reshape(-1) for s in all_sections])
    return parts[5] ^ src_flat[-1], src_flat[:1]

@jax.jit
def stage_D(d):  # full
    return float_compress_core(d, n, ft, 10)

for name, f in (("A split", stage_A), ("B +ans_sections", stage_B),
                ("C +concat", stage_C), ("D full", stage_D)):
    print(f"{name:16s}: {chain_time(f, data32)*1e3:7.3f} ms", flush=True)
