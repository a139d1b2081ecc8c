"""Shot sampling and counts-dict conversion.

Replaces Aer's multinomial shot sampling (reference run_experiment.py:56-57)
with ``jax.random.categorical`` and produces counts dicts in the exact JSON
schema of the stored ``result_simulation_*.json`` files: ``{bitstring:
count}`` with keys of width ``n + K + 1`` summing to the shot count.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from qcmrf_tpu.utils.bits import key_string


@functools.partial(jax.jit, static_argnums=(2,))
def sample_from_probs(key: jax.Array, probs: jax.Array, shots: int) -> jax.Array:
    """Draw ``shots`` outcome indices from a probability vector."""
    logits = jnp.log(jnp.maximum(probs, 1e-38))
    return jax.random.categorical(key, logits, shape=(shots,)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def histogram(samples: jax.Array, length: int) -> jax.Array:
    """Dense outcome histogram on device."""
    return jnp.bincount(samples, length=length)


def counts_from_samples(samples, width: int) -> Dict[str, int]:
    """Counts dict (reference result-JSON schema) from outcome indices."""
    samples = np.asarray(samples)
    vals, cnts = np.unique(samples, return_counts=True)
    return {key_string(int(v), width): int(c) for v, c in zip(vals, cnts)}


def counts_to_probs(counts: Dict[str, float], width: int) -> np.ndarray:
    """Dense outcome distribution from a counts / quasi-prob dict."""
    out = np.zeros(1 << width, dtype=np.float64)
    total = 0.0
    for k, v in counts.items():
        out[int(k, 2)] += v
        total += v
    if total > 0:
        out /= total
    return out


def sample_counts(key: jax.Array, probs: jax.Array, shots: int,
                  width: int) -> Dict[str, int]:
    """One-call helper: multinomial shots -> counts dict."""
    samples = sample_from_probs(key, probs, shots)
    return counts_from_samples(samples, width)
