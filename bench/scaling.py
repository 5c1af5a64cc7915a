"""Scaling-efficiency evidence for the compressed collectives.

Measurements (BASELINE north star: >=90% scaling efficiency 1 chip ->
N hosts):

1. WIRE BYTES PER DEVICE, MEASURED — the r5 two-phase wire protocol moves
   ceil(actual_payload / chunk) chunks, so wire bytes are data-dependent;
   every collective reports the payload words it actually moved
   (return_stats=True) and those are what the table records at ndev<=8.
2. WIRE BYTES PER DEVICE, MODELED for ndev in {16, 64, 256} — per-hop wire
   = min(archive_bytes(n/ndev), raw_bytes(n/ndev)) rounded up to one chunk;
   archive sizes come from actually compressing shards of the same
   distribution, so the model's only approximation is using single-addend
   archives for the ring's partial sums (measured agreement at ndev<=8 is
   recorded alongside).
3. NATURAL-RATIO TRACKING — wire_over_raw for every dtype must come in
   under the archive's own compression ratio + 2% (chunk rounding), the
   criterion the static-budget scheme failed (fp16 paid 1.01x raw
   regardless of content).
4. SHARED-TABLE WIRE WIN — for many small shards, compare total gathered
   bytes with per-member tables vs the shared-frequency-table mode where
   one table serves every member (parallel/sharded.py).
5. Wall time on the virtual CPU mesh for 2/4/8 devices (correctness-level
   sanity only — CPU "ICI" is memcpy; real ICI numbers need a pod slice).

Writes bench/results_scaling_r5.csv (kind,dtype,ndev,metric,value).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python bench/scaling.py
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # the fp64 row must really be fp64

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dietgpu_fork_tpu.core.constants import FLOAT_WORD_SIZE, FloatType
from dietgpu_fork_tpu.models.float_codec import float_compress_core
from dietgpu_fork_tpu.parallel import collectives as coll
from dietgpu_fork_tpu.parallel import sharded as sh

_CSV = os.path.join(os.path.dirname(__file__), "results_scaling_r5.csv")
_rows = []

_DTYPES = [
    ("float16", FloatType.FLOAT16, np.float16),
    ("bfloat16", FloatType.BFLOAT16, jnp.bfloat16),
    ("float32", FloatType.FLOAT32, np.float32),
    ("float64", FloatType.FLOAT64, np.float64),
]


def row(kind, dtype, ndev, metric, value):
    _rows.append(f"{kind},{dtype},{ndev},{metric},{value}")


def archive_bytes(n_floats: int, ft: FloatType, rng) -> int:
    """Exact archive size of an N(0,1) shard of n_floats (device compress)."""
    xs = rng.normal(0, 1, (n_floats,))
    ws = FLOAT_WORD_SIZE[ft]
    if ft == FloatType.FLOAT16:
        w = xs.astype(np.float16).view(np.uint16)
    elif ft == FloatType.BFLOAT16:
        w = (xs.astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
    elif ft == FloatType.FLOAT32:
        w = xs.astype(np.float32).view(np.uint32)
    else:
        w = xs.astype(np.float64).view(np.uint64)
    b = w.tobytes()
    pad = (-len(b)) % 4
    x32 = jnp.asarray(
        np.frombuffer(b + b"\0" * pad, np.uint32)[None, :]
    )
    _, cb = jax.jit(
        float_compress_core, static_argnames=("float_type", "prob_bits")
    )(x32, jnp.array([n_floats], jnp.int32), ft, 10)
    return int(np.asarray(cb)[0])


def modeled_hop_wire(n_floats: int, ft: FloatType, arch_b: int) -> int:
    """Wire bytes of one chunked transfer under the r5 protocol."""
    raw_w = -(-n_floats * FLOAT_WORD_SIZE[ft] // 4)
    payload_w = min(-(-arch_b // 4), raw_w)
    cw = coll._chunk_words(raw_w, None)
    return 4 * -(-payload_w // cw) * cw


def main():
    n = 1 << 16
    rng = np.random.default_rng(0)
    devs = jax.devices()

    print(f"# modeled per-device wire bytes, n={n} N(0,1) floats "
          f"(archive sizes measured by compressing real shards)")
    print("dtype     ndev  all_gather  rs_ring  ar_ring  ar_vs_raw_ring")
    for name, ft, _ in _DTYPES:
        raw = n * FLOAT_WORD_SIZE[ft]
        for ndev in (2, 4, 8, 16, 64, 256):
            chunk_n = n // ndev
            arch_full = archive_bytes(n, ft, np.random.default_rng(1))
            arch_chunk = archive_bytes(chunk_n, ft, np.random.default_rng(1))
            w_full = modeled_hop_wire(n, ft, arch_full)
            w_chunk = modeled_hop_wire(chunk_n, ft, arch_chunk)
            wb = {
                "all_gather": (ndev - 1) * w_full,
                "reduce_scatter_ring": ndev * w_chunk,
                "all_reduce_ring": (2 * ndev - 1) * w_chunk,
            }
            # a RAW ring all-reduce moves (2*ndev-1)/ndev * raw bytes per
            # device; the compressed ring must never exceed it (the raw
            # fallback guarantees this), and beats it when chunks compress
            raw_ar = (2 * ndev - 1) * (raw // ndev)
            print(
                f"{name:9s} {ndev:4d}  {wb['all_gather']:10d}"
                f"  {wb['reduce_scatter_ring']:7d}"
                f"  {wb['all_reduce_ring']:7d}"
                f"  {wb['all_reduce_ring'] / raw_ar:11.4f}"
            )
            for k, v in wb.items():
                row("wire_model", name, ndev, k, v)
            row("wire_model", name, ndev, "ar_ring_vs_raw",
                round(wb["all_reduce_ring"] / raw, 4))
            row("wire_model", name, ndev, "ar_ring_vs_raw_ring",
                round(wb["all_reduce_ring"] / raw_ar, 4))

    # measured all-gather wire + round trip on the 8-device mesh
    print("\n# measured all-gather wire (8-device mesh, two-phase protocol)")
    if len(devs) >= 8:
        mesh = Mesh(np.array(devs[:8]), ("data",))
        for name, ft, dt in _DTYPES:
            per = 8192
            xs = rng.normal(0, 1, (8 * per,)).astype(np.float32)
            x = jax.device_put(
                jnp.asarray(xs, dt), NamedSharding(mesh, P("data"))
            )
            out, good, wire = coll.compressed_all_gather(
                x, mesh, return_stats=True
            )
            ok = bool(np.all(np.asarray(good)))
            exact = bool(
                np.array_equal(
                    np.asarray(out).astype(np.float32),
                    np.asarray(x).astype(np.float32),
                )
            )
            raw = per * FLOAT_WORD_SIZE[ft]
            wire_b = 4 * int(np.asarray(wire).max())
            arch = archive_bytes(per, ft, np.random.default_rng(2))
            natural = arch / raw
            print(
                f"{name:9s} carried={ok} bit_exact={exact} "
                f"wire/raw={wire_b / raw:.4f} natural={natural:.4f} "
                f"(margin {wire_b / raw - natural:+.4f})"
            )
            row("verify", name, 8, "carried", int(ok))
            row("verify", name, 8, "bit_exact", int(exact))
            row("verify", name, 8, "wire_over_raw", round(wire_b / raw, 4))
            row("verify", name, 8, "natural_ratio", round(natural, 4))
            assert ok and exact, f"{name} failed round trip"
            assert wire_b / raw < min(natural, 1.0) + 0.02, (
                f"{name} wire {wire_b / raw:.4f} vs natural {natural:.4f}"
            )

        # measured ring reduce-scatter wire per device at 2/4/8 devices:
        # must stay ~flat (total ~= min(ratio,1)*raw + ndev*chunk rounding)
        print("\n# measured ring reduce-scatter wire per device")
        for name, ft, dt in _DTYPES:
            raw = n * FLOAT_WORD_SIZE[ft]
            for ndev in (2, 4, 8):
                m = Mesh(np.array(devs[:ndev]), ("data",))
                x = jax.device_put(
                    jnp.asarray(
                        rng.normal(0, 1, (ndev, n)).astype(np.float32), dt
                    ),
                    NamedSharding(m, P("data")),
                )
                outs = coll.compressed_reduce_scatter(
                    x, m, return_stats=True
                )
                wire_b = 4 * int(np.asarray(outs[2]).max())
                assert bool(np.all(np.asarray(outs[1])))
                print(f"{name:9s} ndev={ndev}: rs wire/raw "
                      f"{wire_b / raw:.4f}")
                row("wire_measured", name, ndev, "rs_ring_over_raw",
                    round(wire_b / raw, 4))

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
