"""Test configuration: run JAX on CPU with 8 virtual devices so the full
suite (including multi-chip sharding tests) runs anywhere. Mirrors the
reference's strategy of seeded-random round-trip testing (SURVEY.md §4), with
the addition of a NumPy oracle for byte-exact archive assertions."""

import os

# The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. axon); tests
# must run on the host CPU with 8 virtual devices, so force both the env var
# and the config (a sitecustomize can re-assert the env var). Set
# DIETTPU_TEST_TPU=1 to run on the real chip instead (enables
# tests/test_tpu_kernels.py, shrinks the virtual mesh tests to 1 device).
_ON_TPU = os.environ.get("DIETTPU_TEST_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from dietgpu_fork_tpu.core.constants import FloatType  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xD1E7)


def make_float_words(rng, float_type, n, scale=1.0):
    """N(0, scale) data as raw words of the given float type."""
    x = rng.normal(0, scale, n)
    ft = FloatType(float_type)
    if ft == FloatType.FLOAT16:
        return x.astype(np.float16).view(np.uint16)
    if ft == FloatType.BFLOAT16:
        return (x.astype(np.float32).view(np.uint32) >> 16).astype(np.uint16)
    if ft == FloatType.FLOAT32:
        return x.astype(np.float32).view(np.uint32)
    if ft == FloatType.FLOAT64:
        return x.astype(np.float64).view(np.uint64)
    raise ValueError(float_type)


def make_exponential_bytes(rng, n, lam):
    """Exponential-sharpness byte data, as in the reference ANSTest.cu."""
    return np.minimum(rng.exponential(scale=256.0 / lam, size=n), 255).astype(
        np.uint8
    )
