"""Runtime configuration knobs.

DIETTPU_INTERPRET=1 routes every Pallas kernel through pallas_call's
interpret mode on non-TPU backends, so the full TPU code path (kernels,
staging layouts, fused joins) runs — slowly — on CPU. Used by the
interpret-mode test suite and for kernel development when no chip is
reachable; without the flag, non-TPU backends use the portable XLA
fallbacks as before.
"""

from __future__ import annotations

import os


def interpret_mode() -> bool:
    """True when Pallas kernels should run in interpret mode (CPU)."""
    import jax

    return (
        jax.default_backend() != "tpu"
        and os.environ.get("DIETTPU_INTERPRET") == "1"
    )


def use_pallas() -> bool:
    """True when the Pallas kernel path should be taken (real TPU, or
    interpret mode forced via DIETTPU_INTERPRET=1)."""
    import jax

    return jax.default_backend() == "tpu" or interpret_mode()


def pallas_call(*args, interpret: bool = False, **kwargs):
    """pl.pallas_call that honors DIETTPU_INTERPRET (see module doc)."""
    from jax.experimental import pallas as pl

    return pl.pallas_call(
        *args, interpret=interpret or interpret_mode(), **kwargs
    )
