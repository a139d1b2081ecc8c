"""Bidirectional map between MRF log-potentials theta and circuit angles gamma.

Parity with the lazy ``theta``/``gamma`` properties of the reference
(/root/reference/QCMRF.py:129-157):

    gamma = 0.5 * arccos(exp(beta * theta / 2))
    theta = 2 * ln(cos(2 * gamma)) / beta

The forward map requires ``theta <= 0`` (the arccos argument must be <= 1);
this is guaranteed by the reference's -HalfNormal prior
(run_experiment.py:30) and its U(-5, 0) default init (QCMRF.py:213).
Verified semantics: each clique's ancilla-0 branch multiplies the amplitude
of basis state x by ``cos(2*gamma(x)) = exp(beta*theta(x)/2)`` (SURVEY.md
Appendix A items 1, 5).
"""

from __future__ import annotations

import jax
import numpy as np


def _xp(x):
    """Dispatch: jnp for traced/JAX inputs (jit-safe), float64 numpy for
    host-side compile-time use (arccos near theta=0 is ill-conditioned in
    float32)."""
    if isinstance(x, jax.Array) or isinstance(x, jax.core.Tracer):
        import jax.numpy as jnp

        return jnp, x
    return np, np.asarray(x, dtype=np.float64)


def theta_to_gamma(theta, beta=1.0):
    """``gamma = 0.5 * arccos(exp(beta*theta/2))``; requires theta <= 0."""
    xp, theta = _xp(theta)
    return 0.5 * xp.arccos(xp.exp(beta * 0.5 * theta))


def gamma_to_theta(gamma, beta=1.0):
    """``theta = 2 * ln(cos(2*gamma)) / beta``."""
    xp, gamma = _xp(gamma)
    return 2.0 * xp.log(xp.cos(2.0 * gamma)) / beta


def validate_theta_domain(theta) -> None:
    """Raise if any theta > 0 (outside the real-angle domain)."""
    import numpy as np

    t = np.asarray(theta)
    if np.any(t > 0):
        raise ValueError(
            "QCMRF circuit parameters require theta <= 0 "
            "(gamma = arccos(exp(beta*theta/2))/2 must be real); "
            f"got max(theta) = {t.max()}"
        )
