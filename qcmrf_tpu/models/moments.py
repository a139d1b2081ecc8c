"""Streaming exact moments and a differentiable streaming lnZ.

Closes the arbitrary-structure training gap between the enumeration
table (a 2^n logits table stops fitting beside an optimizer state around
n=22) and variable elimination (any n, but only bounded treewidth): a
chunked, gather-free sweep of the 2^n state space computes the exact
clique-marginal vector ``E_p[phi]`` without materializing any 2^n array,
and a custom-VJP wrapper turns the streaming lnZ into a differentiable
building block (``d lnZ / d theta = beta * E_p[phi]``), so exact MLE
runs for ANY clique structure at any ``n <= 31`` (int32 state ids) on
one chip.

The reference delegates all exact inference to ``kiopto_native``
(/root/reference/eval.py:84-93) and never trains; this extends the
oracle surface rather than mirroring it. The sweep is pure XLA (the
per-chunk work is dense FMA chains XLA fuses well); the lnZ forward
pass reuses :func:`qcmrf_tpu.ops.kernels.log_partition`, which streams
through the Pallas block-split kernel at large n.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from qcmrf_tpu.models.mrf import MRF

#: states per sweep chunk: big enough that the per-chunk dispatch is
#: amortized, small enough that the (chunk,)-sized intermediates (one
#: weight vector + one live mask per clique state) stay cache-friendly
_CHUNK_BITS = 16


def _chunk_moments(mrf: MRF, x: jax.Array, lnZ) -> jax.Array:
    """(d,) partial ``sum_x p(x) * phi(x)`` over the states ``x``.

    Per clique the 2^|C| state masks are built by a doubling recursion
    over the slots (2 multiplies per mask), processed in REVERSED slot
    order so mask index == the theta layout's y index (clique-major, y
    binary-counting, y[0] slowest — utils/bits.py conventions)."""
    from qcmrf_tpu.sim.analytic import log_potentials_fast

    w = jnp.exp(log_potentials_fast(mrf, x) - lnZ)  # p(x), exact
    parts = []
    for C in mrf.cliques:
        masks = [w]
        for v in reversed(C):
            b = ((x >> (mrf.n - 1 - v)) & 1).astype(w.dtype)
            nb = 1.0 - b
            masks = [m * nb for m in masks] + [m * b for m in masks]
        parts.append(jnp.stack([m.sum() for m in masks]))
    return jnp.concatenate(parts)


def clique_moments_streaming(mrf: MRF, lnZ=None) -> jax.Array:
    """Exact model moments ``E_p[phi]`` (the clique-marginal vector in
    theta layout) by a chunked streaming sweep — no 2^n array ever
    materializes, so the only width limit is the int32 state-id space
    (n <= 31). ``lnZ`` may be passed to skip recomputing it.

    For bounded-treewidth models prefer
    :func:`qcmrf_tpu.models.elimination.clique_marginals`; this exists
    for structures whose induced width makes elimination intractable.
    """
    from qcmrf_tpu.ops import kernels

    if mrf.n > 31:
        raise ValueError(
            f"streaming moments cap at n=31 (int32 state ids); got "
            f"n={mrf.n} — bounded-treewidth models can use "
            "models.elimination.clique_marginals at any n"
        )
    if lnZ is None:
        lnZ = kernels.log_partition(mrf)
    if mrf.n <= _CHUNK_BITS:
        return _chunk_moments(
            mrf, jnp.arange(1 << mrf.n, dtype=jnp.int32), lnZ
        )
    csize = 1 << _CHUNK_BITS
    starts = jnp.arange(
        1 << (mrf.n - _CHUNK_BITS), dtype=jnp.int32
    ) << _CHUNK_BITS

    def step(acc, s):
        x = s + jnp.arange(csize, dtype=jnp.int32)
        return acc + _chunk_moments(mrf, x, lnZ), None

    acc0 = jnp.zeros((mrf.dimension,), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, starts)
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _lnZ_streaming(cliques: tuple, n: int, beta: float, theta):
    m = MRF(theta=theta, beta=beta, cliques=cliques, n=n)
    from qcmrf_tpu.ops import kernels

    return kernels.log_partition(m)


def _lnZ_fwd(cliques, n, beta, theta):
    lnZ = _lnZ_streaming(cliques, n, beta, theta)
    return lnZ, (theta, lnZ)


def _lnZ_bwd(cliques, n, beta, res, g):
    theta, lnZ = res
    m = MRF(theta=theta, beta=beta, cliques=cliques, n=n)
    mu = clique_moments_streaming(m, lnZ)
    return (beta * mu * g,)


_lnZ_streaming.defvjp(_lnZ_fwd, _lnZ_bwd)


def log_partition_streaming(mrf: MRF) -> jax.Array:
    """``ln Z`` differentiable w.r.t. ``mrf.theta`` with the gradient
    computed by the streaming moment sweep (``beta * E_p[phi]``) instead
    of autodiff through a 2^n table — exact MLE for arbitrary clique
    structures past table widths. ``beta`` is treated as a constant
    (must be a concrete host value, the QCMRF training convention)."""
    return _lnZ_streaming(mrf.cliques, mrf.n, float(mrf.beta), mrf.theta)
