"""Shared bits for the Pallas kernel modules (one definition, not three)."""

from __future__ import annotations

import jax


def interpret() -> bool:
    """Run kernels in interpret mode off-TPU (the CPU unit suite)."""
    return jax.default_backend() != "tpu"
