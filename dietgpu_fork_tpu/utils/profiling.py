"""Profiling hooks: the TPU analog of the reference's profilerStart/Stop
(`/root/reference/dietgpu/utils/DeviceUtils.cpp:48-54`) plus a fenced wall
timer for the tunneled-runtime quirks this repo documents in bench.py.

Usage::

    from dietgpu_fork_tpu.utils.profiling import trace, timed

    with trace("/tmp/tb"):           # view with TensorBoard / xprof
        out = compress_data(...)

    ms = timed(lambda: jax.jit(f)(x))   # fenced, best-of-N milliseconds
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int = 2):
    """Capture a jax.profiler trace around the body (profilerStart/Stop).

    Falls back to a no-op if the backend/plugin cannot trace (the axon
    tunnel does not always support device tracing)."""
    started = False
    try:
        jax.profiler.start_trace(
            log_dir,
            create_perfetto_link=False,
            create_perfetto_trace=True,
        )
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def fence(x) -> None:
    """Force completion of ``x`` as observed from the host: a 1-element
    device-to-host copy (block_until_ready may return early through the
    axon tunnel)."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[0].ravel()[:1])


def timed(fn: Callable[[], object], *, repeats: int = 5) -> float:
    """Best-of-N fenced wall time of ``fn`` in milliseconds (includes
    dispatch overhead; for overhead-free per-iteration numbers chain
    dependent iterations inside one jit as bench.py does)."""
    fence(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fence(fn())
        best = min(best, time.time() - t0)
    return best * 1e3
