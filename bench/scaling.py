"""Scaling-efficiency evidence for the compressed collectives.

Measurements (BASELINE north star: >=90% scaling efficiency 1 chip ->
N hosts):

1. WIRE BYTES PER DEVICE — exact, analytic (the wire buffers are static):
   shows the ring reduce-scatter / all-reduce keep per-device traffic
   independent of device count, while the old gather-then-sum formulation
   grew linearly. This is the quantity that determines scaling efficiency
   on real ICI (per-hop wire time is constant, hops overlap).
2. PER-DTYPE DEFAULT-BUDGET VERIFICATION — run compressed_all_gather on the
   8-device virtual mesh at the default budget_ratio for each dtype and
   check (a) the round trip is bit-exact, (b) no overflow flag tripped,
   (c) wire bytes <= budget as claimed.
3. SHARED-TABLE WIRE WIN — for many small shards, compare total gathered
   bytes with per-member tables vs the shared-frequency-table mode where
   one table serves every member (parallel/sharded.py).
4. Wall time on the virtual CPU mesh for 2/4/8 devices (correctness-level
   sanity only — CPU "ICI" is memcpy; real ICI numbers need a pod slice).

Writes bench/results_scaling_r{N}.csv (kind,dtype,ndev,metric,value).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python bench/scaling.py
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)  # the fp64 row must really be fp64

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dietgpu_fork_tpu.core.constants import FLOAT_WORD_SIZE, FloatType
from dietgpu_fork_tpu.parallel import collectives as coll
from dietgpu_fork_tpu.parallel import sharded as sh

_CSV = os.path.join(os.path.dirname(__file__), "results_scaling_r3.csv")
_rows = []


def row(kind, dtype, ndev, metric, value):
    _rows.append(f"{kind},{dtype},{ndev},{metric},{value}")


def wire_bytes_per_device(
    n_floats: int, ft: FloatType, ndev: int, budget_ratio=None
):
    """Analytic per-device RECEIVE bytes for each collective (wire buffers
    are static, so these are exact, not estimates)."""
    br = coll._resolve_budget(budget_ratio, ft)
    chunk = n_floats // ndev
    w_full = 4 * coll._wire_words(n_floats, ft, br)
    w_chunk = 4 * coll._wire_words(chunk, ft, br)
    return {
        "all_gather": (ndev - 1) * w_full,
        "reduce_scatter_ring": ndev * w_chunk,  # ndev hops of one chunk
        "all_reduce_ring": ndev * w_chunk + (ndev - 1) * w_chunk,
        "all_reduce_gather_sum_OLD": ndev * w_full,  # round-1 formulation
    }


_DTYPES = [
    ("float16", FloatType.FLOAT16, np.float16),
    ("bfloat16", FloatType.BFLOAT16, jnp.bfloat16),
    ("float32", FloatType.FLOAT32, np.float32),
    ("float64", FloatType.FLOAT64, np.float64),
]


def main():
    n = 1 << 16
    print(f"# wire bytes per device, n={n}, per-dtype default budgets")
    print("dtype     ndev  all_gather  rs_ring  ar_ring  ar_old(gather+sum)")
    for name, ft, _ in _DTYPES:
        raw = n * FLOAT_WORD_SIZE[ft]
        for ndev in (2, 4, 8, 16, 64, 256):
            wb = wire_bytes_per_device(n, ft, ndev)
            print(
                f"{name:9s} {ndev:4d}  {wb['all_gather']:10d}"
                f"  {wb['reduce_scatter_ring']:7d}  {wb['all_reduce_ring']:7d}"
                f"  {wb['all_reduce_gather_sum_OLD']:10d}"
            )
            for k, v in wb.items():
                row("wire", name, ndev, k, v)
            row("wire", name, ndev, "ar_ring_vs_raw",
                round(wb["all_reduce_ring"] / raw, 4))

    # per-dtype all-gather round trip at the DEFAULT budget on 8 devices
    devs = jax.devices()
    rng = np.random.default_rng(0)
    print("\n# default-budget all-gather verification (8-device mesh)")
    if len(devs) >= 8:
        mesh = Mesh(np.array(devs[:8]), ("data",))
        for name, ft, dt in _DTYPES:
            per = 8192
            xs = rng.normal(0, 1, (8 * per,)).astype(np.float32)
            x = jax.device_put(
                jnp.asarray(xs, dt), NamedSharding(mesh, P("data"))
            )
            out, good = coll.compressed_all_gather(x, mesh)
            ok = bool(np.all(np.asarray(good)))
            exact = bool(
                np.array_equal(
                    np.asarray(out).astype(np.float32),
                    np.asarray(x).astype(np.float32),
                )
            )
            br = coll._resolve_budget(None, ft)
            wire = 4 * coll._wire_words(per, ft, br)
            raw = per * FLOAT_WORD_SIZE[ft]
            print(
                f"{name:9s} default budget {br:.2f}: carried={ok} "
                f"bit_exact={exact} wire/raw={wire / raw:.3f}"
            )
            row("verify", name, 8, "carried_at_default", int(ok))
            row("verify", name, 8, "bit_exact", int(exact))
            row("verify", name, 8, "wire_over_raw", round(wire / raw, 4))
            assert ok and exact, f"{name} failed at default budget"

        # shared-frequency-table wire win: 64 small shards, one table
        print("\n# shared-table wire win (64 x 4 KiB shards, raw ANS)")
        B, S = 64, 4096
        data = rng.integers(0, 48, (B, S)).astype(np.uint8)
        sizes = jnp.full((B,), S, jnp.int32)
        from dietgpu_fork_tpu.api import codec as C

        sep = C.compress_data_simple(False, list(data))
        sep_total = sum(a.size for a in sep)
        comp, comp_bytes = sh.ans_encode_shared_table(
            mesh, jnp.asarray(data), sizes
        )
        cb = np.asarray(comp_bytes).astype(np.int64)
        shared_total = int(cb.sum())
        # one shared table serves every member: ship meta (header+table,
        # 544 B) once instead of per member
        shared_wire = shared_total - (B - 1) * 544
        print(
            f"separate tables: {sep_total} B, shared-table archives: "
            f"{shared_total} B, shared wire (table shipped once): "
            f"{shared_wire} B ({shared_wire / sep_total:.3f}x)"
        )
        row("shared_table", "uint8", 8, "separate_total_bytes", sep_total)
        row("shared_table", "uint8", 8, "shared_total_bytes", shared_total)
        row("shared_table", "uint8", 8, "shared_wire_bytes", shared_wire)
        row("shared_table", "uint8", 8, "wire_vs_separate",
            round(shared_wire / sep_total, 4))

    # virtual-mesh wall times (sanity, not ICI-representative)
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
        row("walltime_cpu", "float32", ndev, "reduce_scatter_ms",
            round(dt * 1e3, 2))

    with open(_CSV, "w") as f:
        f.write("kind,dtype,ndev,metric,value\n")
        f.write("\n".join(_rows) + "\n")
    print(f"\nwrote {_CSV}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
