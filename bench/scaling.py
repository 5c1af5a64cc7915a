"""Scaling-efficiency evidence for the compressed collectives.

Two measurements (BASELINE north star: >=90% scaling efficiency 1 chip ->
N hosts):

1. WIRE BYTES PER DEVICE — exact, analytic (the wire buffers are static):
   shows the ring reduce-scatter / all-reduce keep per-device traffic
   independent of device count, while the old gather-then-sum formulation
   grew linearly. This is the quantity that determines scaling efficiency
   on real ICI (per-hop wire time is constant, hops overlap).
2. Wall time on the virtual CPU mesh for 2/4/8 devices (correctness-level
   sanity only — CPU "ICI" is memcpy; real ICI numbers need a pod slice).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python bench/scaling.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dietgpu_fork_tpu.core.constants import FLOAT_WORD_SIZE, FloatType
from dietgpu_fork_tpu.parallel import collectives as coll


def wire_bytes_per_device(
    n_floats: int, ft: FloatType, ndev: int, budget_ratio: float = 1.0
):
    """Analytic per-device RECEIVE bytes for each collective (wire buffers
    are static, so these are exact, not estimates)."""
    chunk = n_floats // ndev
    w_full = 4 * coll._wire_words(n_floats, ft, budget_ratio)
    w_chunk = 4 * coll._wire_words(chunk, ft, budget_ratio)
    return {
        "all_gather": (ndev - 1) * w_full,
        "reduce_scatter_ring": ndev * w_chunk,  # ndev hops of one chunk
        "all_reduce_ring": ndev * w_chunk + (ndev - 1) * w_chunk,
        "all_reduce_gather_sum_OLD": ndev * w_full,  # round-1 formulation
    }


def main():
    n = 1 << 16
    ft = FloatType.FLOAT32
    print(f"# wire bytes per device, n={n} fp32, budget_ratio=1.0")
    print("ndev  all_gather  rs_ring  ar_ring  ar_old(gather+sum)")
    for ndev in (2, 4, 8, 16, 64, 256):
        wb = wire_bytes_per_device(n, ft, ndev)
        print(
            f"{ndev:4d}  {wb['all_gather']:10d}  {wb['reduce_scatter_ring']:7d}"
            f"  {wb['all_reduce_ring']:7d}  {wb['all_reduce_gather_sum_OLD']:10d}"
        )
    raw = 4 * n
    wb8 = wire_bytes_per_device(n, ft, 8)
    print(
        f"\nring all-reduce wire vs raw addend: "
        f"{wb8['all_reduce_ring'] / raw:.3f}x (compressed), "
        f"old formulation at ndev=8: "
        f"{wb8['all_reduce_gather_sum_OLD'] / raw:.3f}x and growing with ndev"
    )

    # virtual-mesh wall times (sanity, not ICI-representative)
    devs = jax.devices()
    rng = np.random.default_rng(0)
    print("\n# virtual-mesh wall time (CPU, sanity only)")
    for ndev in (2, 4, 8):
        if len(devs) < ndev:
            break
        mesh = Mesh(np.array(devs[:ndev]), ("data",))
        x = jax.device_put(
            jnp.asarray(rng.normal(0, 1, (ndev, n)), jnp.float32),
            NamedSharding(mesh, P("data")),
        )
        f = jax.jit(lambda v: coll.compressed_reduce_scatter(v, mesh))
        out = f(x)
        np.asarray(out[0])  # fence
        t0 = time.time()
        for _ in range(3):
            np.asarray(f(x)[0])
        dt = (time.time() - t0) / 3
        print(f"ndev={ndev}: reduce_scatter {dt*1e3:8.1f} ms "
              f"(n/ndev={n//ndev} floats/device chunk)")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
