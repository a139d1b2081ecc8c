"""Streaming exact moments and a differentiable streaming lnZ.

Closes the arbitrary-structure training gap between the enumeration
table (a 2^n logits table stops fitting beside an optimizer state around
n=22) and variable elimination (any n, but only bounded treewidth): a
chunked, gather-free sweep of the 2^n state space computes the exact
clique-marginal vector ``E_p[phi]`` without materializing any 2^n array,
and a custom-VJP wrapper turns the streaming lnZ into a differentiable
building block (``d lnZ / d theta = beta * E_p[phi]``), so exact MLE
runs for ANY clique structure on one chip.

The sweep works in (block, offset) coordinates — every chunk's states
are ``x = blk * 2^cb + offset`` — so no flat state id is ever formed:
bits below the chunk cut come from the int32 ``offset`` vector and bits
above it from the int32 scalar ``blk``, which keeps every in-sweep
integer below int32 past the 2^31-state-id limit (same block-unit
device as the streaming lnZ/MAP kernels, ops/kernels.py::_split_logpot).
Width cap: ``n - cb <= 31`` ⇒ n <= 47 structurally; sweep time is the
practical bound (~2^n work).

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
from qcmrf_tpu.utils import moebius

#: states per sweep chunk: big enough that the per-chunk dispatch is
#: amortized, small enough that the (chunk,)-sized intermediates (one
#: weight vector + one live mask per clique state) stay cache-friendly
_CHUNK_BITS = 16

#: past the int32 state-id limit the block count 2^(n-cb) is the scan
#: length — bigger chunks keep it bounded (4 MB weight vectors are
#: nothing to HBM)
_CHUNK_BITS_BIG = 20

#: structural width cap: the scalar block index must stay int32
_MAX_N = 47


def _chunk_bits(mrf: MRF, blk, offset, cb: int):
    """Bit value of every used variable over the chunk's states
    ``x = blk * 2^cb + offset``: a (chunk,) plane for variables in the
    low id bits, a chunk-constant scalar for variables above the cut
    (variable 0 = MSB of state ids; utils/bits.py)."""
    bits = {}
    for v in sorted({u for C in mrf.cliques for u in C}):
        p = mrf.n - 1 - v
        if p < cb:
            bits[v] = ((offset >> p) & 1).astype(jnp.float32)
        else:
            bits[v] = ((blk >> (p - cb)) & 1).astype(jnp.float32)
    return bits


def _chunk_moments(mrf: MRF, coef, lnZ, blk, offset, cb: int):
    """(d,) partial ``sum_x p(x) * phi(x)`` over one chunk.

    ``coef`` is the beta-scaled Moebius coefficient table (the FMA twin
    of ``beta * theta^T phi``, sim/analytic.py::log_potentials_fast).
    Per clique the 2^|C| state masks are built by a doubling recursion
    over the slots (2 multiplies per mask; chunk-constant bits broadcast
    as scalars), processed in REVERSED slot order so mask index == the
    theta layout's y index (clique-major, y binary-counting, y[0]
    slowest — utils/bits.py conventions)."""
    cmax = max(len(C) for C in mrf.cliques)
    bits = _chunk_bits(mrf, blk, offset, cb)

    lp = jnp.zeros(offset.shape, jnp.float32)
    for k, C in enumerate(mrf.cliques):
        off = k << cmax
        lp = moebius.eval_multilinear(
            [bits[v] for v in C], len(C),
            lambda s, off=off: coef[off + s], lp,
        )
    w = jnp.exp(lp - lnZ)  # p(x), exact
    parts = []
    for C in mrf.cliques:
        masks = [w]
        for v in reversed(C):
            b = bits[v]
            nb = 1.0 - b
            masks = [m * nb for m in masks] + [m * b for m in masks]
        parts.append(jnp.stack([m.sum() for m in masks]))
    return jnp.concatenate(parts)


def _beta_coef(mrf: MRF) -> jax.Array:
    from qcmrf_tpu.sim.analytic import _moebius_layout

    idx_map, _, cmax = _moebius_layout(mrf.cliques, mrf.n)
    tab = (mrf.beta * mrf.theta[jnp.asarray(idx_map)]).astype(jnp.float32)
    return moebius.transform(tab, cmax).reshape(-1)


def clique_moments_streaming(mrf: MRF, lnZ=None) -> jax.Array:
    """Exact model moments ``E_p[phi]`` (the clique-marginal vector in
    theta layout) by a chunked streaming sweep — no 2^n array and no
    flat state id ever materializes, so the sweep runs past the int32
    state-id limit (structural cap ``n <= 47``; time is the practical
    bound). ``lnZ`` may be passed to skip recomputing it.

    For bounded-treewidth models prefer
    :func:`qcmrf_tpu.models.elimination.clique_marginals`; this exists
    for structures whose induced width makes elimination intractable.
    """
    from qcmrf_tpu.ops import kernels

    if mrf.n > _MAX_N:
        raise ValueError(
            f"streaming moments cap at n={_MAX_N} (int32 block ids); got "
            f"n={mrf.n} — bounded-treewidth models can use "
            "models.elimination.clique_marginals at any n"
        )
    if lnZ is None:
        lnZ = kernels.log_partition(mrf)
    coef = _beta_coef(mrf)
    cb = min(_CHUNK_BITS if mrf.n <= 31 else _CHUNK_BITS_BIG, mrf.n)
    if mrf.n == cb:
        return _chunk_moments(
            mrf, coef, lnZ, jnp.int32(0),
            jnp.arange(1 << cb, dtype=jnp.int32), cb,
        )
    offset = jnp.arange(1 << cb, dtype=jnp.int32)
    blks = jnp.arange(1 << (mrf.n - cb), dtype=jnp.int32)

    def step(acc, blk):
        return acc + _chunk_moments(mrf, coef, lnZ, blk, offset, cb), None

    acc0 = jnp.zeros((mrf.dimension,), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, blks)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _lnZ_streaming_sharded(cliques: tuple, n: int, beta: float, mesh,
                           theta):
    from qcmrf_tpu.parallel import sharded

    m = MRF(theta=theta, beta=beta, cliques=cliques, n=n)
    return sharded.sharded_log_partition(m, mesh)


def _lnZ_sharded_fwd(cliques, n, beta, mesh, theta):
    lnZ = _lnZ_streaming_sharded(cliques, n, beta, mesh, theta)
    return lnZ, (theta, lnZ)


def _lnZ_sharded_bwd(cliques, n, beta, mesh, res, g):
    from qcmrf_tpu.parallel import sharded

    theta, lnZ = res
    m = MRF(theta=theta, beta=beta, cliques=cliques, n=n)
    mu = sharded.sharded_clique_moments(m, mesh, lnZ)
    return (beta * mu * g,)


_lnZ_streaming_sharded.defvjp(_lnZ_sharded_fwd, _lnZ_sharded_bwd)


def log_partition_streaming(mrf: MRF, mesh=None) -> jax.Array:
    """``ln Z`` differentiable w.r.t. ``mrf.theta`` with the gradient
    computed by the streaming moment sweep (``beta * E_p[phi]``) instead
    of autodiff through a 2^n table — exact MLE for arbitrary clique
    structures past table widths. ``beta`` is treated as a constant
    (must be a concrete host value, the QCMRF training convention).
    With ``mesh``, both the forward lnZ sweep and the gradient's moment
    sweep shard over the device mesh (parallel/sharded.py)."""
    if mesh is not None:
        return _lnZ_streaming_sharded(
            mrf.cliques, mrf.n, float(mrf.beta), mesh, mrf.theta
        )
    return _lnZ_streaming(mrf.cliques, mrf.n, float(mrf.beta), mrf.theta)
