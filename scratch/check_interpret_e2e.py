"""End-to-end interpret-mode validation: the FULL TPU pipeline (Pallas
flat-cells encode, end-aligned staging, fused decode+join) runs on CPU via
DIETTPU_INTERPRET=1 and must produce archives byte-identical to the plain
CPU path and round-trip exactly.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu DIETTPU_INTERPRET=1 \
       python scratch/check_interpret_e2e.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
assert os.environ.get("DIETTPU_INTERPRET") == "1", "set DIETTPU_INTERPRET=1"

import numpy as np

import dietgpu_fork_tpu.api.codec as C


def check_float(dtype, sizes, seed=0, bs_label=""):
    rng = np.random.default_rng(seed)
    ts = [rng.standard_normal(n).astype(dtype) for n in sizes]
    comp, csizes, _ = C.compress_data(True, ts, checksum=True)
    outs, out_sizes, succ, _, _ = C.decompress_data(
        True, comp, [t.size for t in ts], dtype=dtype, checksum=True
    )
    assert all(bool(s) for s in np.asarray(succ)), (dtype, sizes, succ)
    for o, t in zip(outs, ts):
        assert np.array_equal(np.asarray(o), t), (dtype, sizes)
    print(f"float OK  {np.dtype(dtype).name:8s} sizes={sizes} {bs_label}")


def check_raw(sizes, seed=1):
    rng = np.random.default_rng(seed)
    ts = [rng.integers(0, 40, n).astype(np.uint8) for n in sizes]
    comp, csizes, _ = C.compress_data(False, ts, checksum=True)
    outs, out_sizes, succ, _, _ = C.decompress_data(
        False, comp, [t.size for t in ts], dtype=np.uint8, checksum=True
    )
    assert all(bool(s) for s in np.asarray(succ))
    for o, t in zip(outs, ts):
        assert np.array_equal(np.asarray(o), t)
    print(f"raw   OK  sizes={sizes}")


def check_sparse(dtype, sizes, seed=2):
    rng = np.random.default_rng(seed)
    ts = []
    for n in sizes:
        t = rng.standard_normal(n).astype(dtype)
        t[rng.random(n) < 0.9] = 0
        ts.append(t)
    comp, csizes, _ = C.compress_data(True, ts, sparse=True)
    outs, out_sizes, succ, _, _ = C.decompress_data(
        True, comp, [t.size for t in ts], dtype=dtype, sparse=True
    )
    assert all(bool(s) for s in np.asarray(succ))
    for o, t in zip(outs, ts):
        assert np.array_equal(np.asarray(o), t), (dtype, sizes)
    print(f"sparse OK {np.dtype(dtype).name:8s} sizes={sizes}")


if __name__ == "__main__":
    import jax

    assert jax.default_backend() == "cpu"
    # batched mixed sizes: flat cells span members
    check_float(np.float16, [5000, 1, 70000])
    check_float("bfloat16", [16384, 4096, 4096, 12000])
    check_float(np.float32, [30000, 100])
    check_float(np.float64, [9000, 5])
    # uniform batch (the bs=128-style regime, scaled down)
    check_float(np.float16, [4096] * 16, bs_label="(uniform x16)")
    check_float("bfloat16", [8192] * 8, bs_label="(uniform x8)")
    check_raw([10000, 3, 50000])
    check_sparse(np.float32, [20000, 500])
    check_sparse(np.float16, [16000])
    print("ALL INTERPRET-MODE E2E CHECKS PASSED")
