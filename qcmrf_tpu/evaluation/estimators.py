"""Shot-based estimators: partition function and clique marginals.

The QCMRF circuit is simultaneously a sampler and an estimator (SURVEY.md
§0): the post-selection success rate delta = accepted/shots estimates
``Z / 2**n`` (the dead-code ``Z/N`` comment at reference
run_experiment.py:88, verified numerically in Appendix A item 5), and the
post-selected samples are Gibbs draws, so clique-marginal estimates are
empirical sufficient-statistic frequencies. This module provides those
estimators over counts dicts, outcome samples, and the fused-sampler
output (BASELINE.json config 2).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qcmrf_tpu.models.mrf import MRF


def success_rate_from_counts(counts: Dict[str, float], n: int) -> float:
    """delta-hat = accepted mass / total mass (eval.py:115-128 semantics)."""
    total = 0.0
    accepted = 0.0
    for k, v in counts.items():
        total += v
        if int(k, 2) < (1 << n):
            accepted += v
    return accepted / total if total else 0.0


def log_partition_from_counts(counts: Dict[str, float], n: int) -> float:
    """ln Z-hat = ln(delta-hat) + n ln 2."""
    delta = success_rate_from_counts(counts, n)
    if delta <= 0:
        return float("-inf")
    return float(np.log(delta) + n * np.log(2.0))


def log_partition_from_parts(a_mask, n: int) -> float:
    """ln Z-hat from the fused sampler's ancilla bitmasks."""
    a = np.asarray(a_mask)
    delta = float((a == 0).mean())
    if delta <= 0:
        return float("-inf")
    return float(np.log(delta) + n * np.log(2.0))


def clique_marginals_exact(mrf: MRF) -> jax.Array:
    """Exact marginal probability of every clique-state pair, shape (d,).

    ``E_p[phi]`` — also the gradient of ln Z w.r.t. theta, so it is
    computed by autodiff through the partition function (one reverse pass,
    no explicit 2**n x d moment matrix). Uses the gather-free chunked
    log-potential evaluation so n up to ~26 works without the (2**n, K,
    cmax) gather intermediates.
    """
    from qcmrf_tpu.sim.analytic import log_potentials_fast

    chunk_bits = min(mrf.n, 18)
    num_chunks = 1 << (mrf.n - chunk_bits)

    def lnZ(theta):
        m = mrf.with_theta(theta)
        if num_chunks == 1:
            lp = log_potentials_fast(
                m, jnp.arange(m.num_states, dtype=jnp.int32)
            )
            return jax.scipy.special.logsumexp(lp)
        starts = jnp.arange(num_chunks, dtype=jnp.int32) << chunk_bits
        offs = jnp.arange(1 << chunk_bits, dtype=jnp.int32)
        # checkpoint: without it the backward pass stores every chunk's
        # O(2^chunk_bits * K) residuals simultaneously and the chunking
        # saves nothing (measured: 7.9 GB -> 0.16 GB at n=24)
        lses = jax.lax.map(
            jax.checkpoint(
                lambda s: jax.scipy.special.logsumexp(
                    log_potentials_fast(m, s + offs)
                )
            ),
            starts,
        )
        return jax.scipy.special.logsumexp(lses)

    return jax.grad(lnZ)(mrf.theta) / mrf.beta


def clique_marginals_from_samples(mrf: MRF, x, accepted=None) -> np.ndarray:
    """Empirical clique marginals from (post-selected) samples.

    ``x`` are variable state ids; ``accepted`` the post-selection mask
    (None = all accepted). Returns the empirical mean of phi, shape (d,).
    """
    x = np.asarray(x)
    if accepted is not None:
        x = x[np.asarray(accepted)]
    idx = np.asarray(mrf.suff_stat_flat_indices(jnp.asarray(x, jnp.int32)))
    out = np.zeros(mrf.dimension)
    np.add.at(out, idx.reshape(-1), 1.0)
    return out / max(len(x), 1)


def estimate_from_circuit(
    key: jax.Array, mrf: MRF, shots: int
) -> Tuple[float, np.ndarray, float]:
    """One-call estimator: run the circuit sampler, post-select, estimate.

    Returns (lnZ_hat, clique_marginals_hat, delta_hat).
    """
    from qcmrf_tpu.sim import analytic

    x, acc = analytic.sample_postselected(key, mrf, shots)
    x, acc = np.asarray(x), np.asarray(acc)
    delta = float(acc.mean())
    lnZ = float(np.log(max(delta, 1e-300)) + mrf.n * np.log(2.0))
    marg = clique_marginals_from_samples(mrf, x, acc)
    return lnZ, marg, delta
