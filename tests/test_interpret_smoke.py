"""Fast interpret-mode smoke test: one small round trip through the FULL
Pallas code path (fused split, rANS encode, ranked-table fused decode+join)
via ``DIETTPU_INTERPRET=1``.

The heavyweight interpret matrix lives in test_interpret_pipeline.py behind
the ``slow`` marker; this single case stays in the default subset so a
default CI run cannot pass while the Pallas decode path is broken (the
fast-subset XLA-fallback tests never enter these kernels).
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("DIETTPU_INTERPRET", "1")


@pytest.fixture
def rng():
    return np.random.default_rng(0x5E0DE)


def test_interpret_decode_roundtrip_smoke(rng):
    import dietgpu_fork_tpu.api.codec as C

    t = rng.standard_normal(9000).astype(np.float16)
    comp, _, _ = C.compress_data(True, [t], checksum=True)
    outs, _, succ, _, _ = C.decompress_data(
        True, comp, [t.size], dtype=np.float16, checksum=True
    )
    assert bool(np.asarray(succ)[0])
    assert np.array_equal(np.asarray(outs[0]), t)
