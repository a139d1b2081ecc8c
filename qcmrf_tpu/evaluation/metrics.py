"""Distribution metrics and post-selection, parity with the reference.

* :func:`fidelity` — Bhattacharyya fidelity ``(sum_i sqrt(P_i Q_i))**2``
  skipping entries where either mass is <= 0 (QCMRF.py:247-253; the skip
  matters for hardware quasi-probability dists with negative entries).
* :func:`kl` — KL divergence with the same skip rule (QCMRF.py:255-261).
* :func:`extract_probs` — post-selection / marginalization of a counts dict
  on all-zero ancillas (QCMRF.py:263-284), returning ``(P, delta)``.

All dense-array versions are vectorized jnp (jit/vmap-friendly); the dict
version mirrors the reference signature exactly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def _xp(P, Q):
    """numpy for host arrays (no device roundtrips in the eval loop's
    per-rep metric calls), jnp for traced/JAX inputs (jit-safe)."""
    import jax

    if isinstance(P, (jax.Array, jax.core.Tracer)) or isinstance(
        Q, (jax.Array, jax.core.Tracer)
    ):
        return jnp, jnp.asarray(P), jnp.asarray(Q)
    return np, np.asarray(P), np.asarray(Q)


def fidelity(P, Q):
    """Bhattacharyya fidelity between pmfs, skipping nonpositive entries."""
    xp, P, Q = _xp(P, Q)
    mask = (P > 0) & (Q > 0)
    F = xp.sqrt(xp.where(mask, P * Q, 0.0)).sum()
    return F ** 2


def kl(P, Q):
    """KL(P || Q), skipping entries where either pmf is nonpositive."""
    xp, P, Q = _xp(P, Q)
    mask = (P > 0) & (Q > 0)
    safe_ratio = xp.where(mask, P / xp.where(mask, Q, 1.0), 1.0)
    return xp.where(mask, P * xp.log(safe_ratio), 0.0).sum()


# reference-parity alias (QCMRF.py:255)
KL = kl


def extract_probs(R: Dict[str, float], n: int, a: int):
    """Post-select a counts dict on ``a`` leading zero ancilla bits.

    Parity with reference ``extract_probs(R, n, a)`` (QCMRF.py:263-284):
    keep keys ``'0'*a + bits(y)``, renormalize; returns ``(P, delta)`` where
    ``delta`` is the accepted fraction of the total mass.
    """
    P = np.zeros(1 << n)
    z0 = 0.0
    for i in range(1 << n):
        s0 = "0" * a + format(i, f"0{n}b")
        if s0 in R:
            P[i] += R[s0]
    z = P.sum()
    for s0 in R:
        z0 += R[s0]
    if z == 0:
        return P, 0
    return P / z, z / z0


def postselect_dense(probs, n: int) -> Tuple[np.ndarray, float]:
    """Post-selection on a dense outcome distribution.

    ``probs`` is indexed by the full-register key int; accepted outcomes are
    exactly those with index < 2**n (eval.py:119-121). Returns the
    renormalized variable distribution and the accepted mass ``Z``.
    """
    probs = jnp.asarray(probs)
    q = probs[: 1 << n]
    Z = q.sum()
    return jnp.where(Z > 0, q / Z, q), Z


def success_bound_check(delta_hat: float, lnZ: float, n: int,
                        tol: float = 0.05) -> bool:
    """Physics self-check: empirical success rate ~ Z / 2**n
    (SURVEY.md Appendix A item 5)."""
    return abs(delta_hat - float(np.exp(lnZ - n * np.log(2.0)))) <= tol
