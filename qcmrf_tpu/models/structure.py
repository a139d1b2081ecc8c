"""MRF structure learning by group-lasso MLE over candidate cliques.

A new capability with no reference counterpart (the reference evaluates
fixed random structures only — /root/reference/run_experiment.py:20-38):
given observed samples and a CANDIDATE clique set (e.g. all pairs), fit
theta with a per-clique group penalty on each block's INTERACTION
content, prune candidates whose interaction is (numerically) absent,
then refit the survivors penalty-free. Standard estimate-then-debias
group lasso (Schmidt/Murphy-style hierarchy); the selection signal is
exact because the NLL gradient routes through the same exact
partition-function backends training uses (enumeration, differentiable
variable elimination at any n, or the mesh-shardable streaming
custom-VJP sweep — ``models.train.make_lnz_fn``), so it scales
wherever exact training does: the round-4 n<=30 confinement is gone.

What "interaction content" means here: a clique block ``theta_C`` is a
function on {0,1}^|C|, decomposable in the Walsh (parity-character)
basis. Its order-0 component is pure gauge (cancels against lnZ), and
its order-1 components are single-variable effects that the always-kept
singleton cliques represent on their own. Only the order >= 2
components make ``C`` a genuine interaction — so the penalty and the
pruning criterion act on the block's projection onto order >= 2
characters. Without this, a non-edge candidate (i, j) would be kept
merely for absorbing the marginal biases f(x_i) + g(x_j) that the
planted model induces on every variable.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.models.train import (
    _from_theta, _to_theta, empirical_moments_from_bits, make_lnz_fn)


def _data_moments(template: MRF, data) -> jnp.ndarray:
    """Empirical ``E_data[phi]`` over the template's cliques, from
    either state ids (1-D; the historical interface, n <= 30) or
    per-variable bit rows (2-D ``(S, n)``; any n). All the NLL needs
    is this vector: ``mean NLL = lnZ - beta * theta^T mu_hat``."""
    arr = np.asarray(data)
    if arr.ndim == 2:
        return jnp.asarray(
            empirical_moments_from_bits(template, arr), jnp.float32)
    from qcmrf_tpu.evaluation.estimators import (
        clique_marginals_from_samples)

    return jnp.asarray(
        clique_marginals_from_samples(template, arr), jnp.float32)


def candidate_pairs(n: int) -> List[List[int]]:
    """All n*(n-1)/2 undirected edges — the usual candidate set for
    pairwise structure recovery."""
    return [[i, j] for i in range(n) for j in range(i + 1, n)]


def _interaction_projector(c: int) -> np.ndarray:
    """(2^c, 2^c) projector onto the span of order >= 2 Walsh characters
    over the clique's y-index (y[0] slowest — the theta layout's
    binary-counting order; the basis is permutation-symmetric so the
    convention only relabels characters)."""
    dim = 1 << c
    y = np.arange(dim)
    # H[s, y] = (-1)^{popcount(s & y)}: character for subset s
    s = np.arange(dim)
    pop = np.vectorize(lambda v: bin(v).count("1"))
    H = np.where(pop(s[:, None] & y[None, :]) % 2 == 0, 1.0, -1.0)
    keep = (pop(s) >= 2).astype(np.float64)
    # P = H^T diag(keep) H / 2^c  (H is symmetric orthogonal/sqrt(dim))
    return (H.T * keep) @ H / dim


def _group_segments(mrf: MRF) -> Tuple[np.ndarray, np.ndarray]:
    """(offsets, sizes) of each clique's block in the flat theta
    (clique-major layout, models/mrf.py)."""
    offsets = np.asarray(mrf.theta_offsets, dtype=np.int64)
    sizes = np.asarray([1 << len(C) for C in mrf.cliques], dtype=np.int64)
    return offsets, sizes


def interaction_norms(mrf: MRF, theta=None) -> np.ndarray:
    """Per-clique strength of the order >= 2 component of each theta
    block (gauge- and unary-invariant). Singleton cliques report 0 by
    construction — they HAVE no order-2 content."""
    th = np.asarray(mrf.theta if theta is None else theta, np.float64)
    offsets, sizes = _group_segments(mrf)
    out = np.empty(len(sizes), np.float64)
    for k, (o, s) in enumerate(zip(offsets, sizes)):
        c = int(s).bit_length() - 1
        out[k] = float(np.linalg.norm(
            _interaction_projector(c) @ th[o:o + s]))
    return out


def _interaction_penalty(mrf: MRF) -> callable:
    """Jittable sum_k ||P_k theta_k||_2 over cliques with order >= 2
    content. The sqrt is smoothed by eps so the gradient stays finite at
    interaction-free blocks (the true subgradient there is the ball
    |g| <= lam; eps approximates picking 0 from it)."""
    offsets, sizes = _group_segments(mrf)
    eps = 1e-12
    projs = {}
    for s in set(sizes.tolist()):
        c = int(s).bit_length() - 1
        if c >= 2:
            projs[int(s)] = jnp.asarray(_interaction_projector(c),
                                        jnp.float32)

    def penalty(theta: jax.Array) -> jax.Array:
        total = jnp.asarray(0.0, theta.dtype)
        for o, s in zip(offsets.tolist(), sizes.tolist()):
            if int(s) not in projs:
                continue  # singleton: no interaction content to penalize
            blk = jax.lax.dynamic_slice_in_dim(theta, int(o), int(s))
            p = projs[int(s)] @ blk
            total = total + jnp.sqrt(jnp.sum(p * p) + eps)
        return total

    return penalty


@dataclasses.dataclass
class StructureFit:
    """Result of :func:`fit_structure`."""
    mrf: MRF                       # refit model over the selected cliques
    selected: List[List[int]]      # surviving size >= 2 cliques
    group_norm: np.ndarray         # interaction norms of the L1 fit, one
    #                                per template clique (singletons 0)
    cliques: List[List[int]]       # the template's cliques, aligned with
    #                                group_norm (singletons + candidates)
    threshold: float               # the prune cut actually applied
    nll: float                     # final refit NLL (penalty-free)


def fit_structure(
    candidates: Sequence[Sequence[int]],
    data: jax.Array,
    n: int,
    lam: float = 0.02,
    steps: int = 400,
    learning_rate: float = 0.05,
    nonpositive: bool = True,
    prune_tol: float = 0.05,
    refit_steps: int = 300,
    beta: float = 1.0,
    mesh=None,
) -> StructureFit:
    """Select an MRF structure from ``candidates`` by group-lasso MLE.

    The template model is every variable's singleton clique (always
    kept, unpenalized — they carry the unary marginals) plus the
    size >= 2 ``candidates``. Phase 1 minimizes ``NLL(theta) +
    lam * sum_k ||order>=2 component of theta_k||_2`` (Adam on the
    softplus-reparameterized theta, like ``fit_mle``). Phase 2 prunes
    candidates whose interaction norm falls below ``prune_tol`` and
    refits singletons + survivors penalty-free for unbiased estimates.

    The default cut is ABSOLUTE, not relative to the largest candidate:
    at sensible ``lam`` the penalty shrinks spurious candidates to a
    noise floor around 1e-3..1e-2 while genuine detections settle an
    order of magnitude higher, and a relative rule breaks whenever true
    interaction strengths themselves vary widely (a strong edge would
    mask a weak-but-real one). The trade-off lives in ``lam``: too
    large absorbs weak real edges INTO the noise floor (they are then
    honestly undetectable), too small lets sampling noise through —
    raise ``data`` size rather than the threshold in that regime.

    ``data`` is state ids (1-D, the historical interface) or bit rows
    (2-D ``(S, n)``, any n) — either way it reduces to the template's
    empirical moments, and the NLL is ``lnZ(theta) - beta * theta^T
    mu_hat`` with ``lnZ`` routed by structure exactly as training's
    (``models.train.make_lnz_fn``: enumeration / differentiable
    elimination at any n / streaming custom-VJP sweep to the streaming
    cap, the last optionally sharded over ``mesh``). All-pairs
    candidates make the template a complete graph, so past n = 26 the
    selection runs on the streaming branch by construction. Adam's
    diagonal scaling does not solve the nonsmooth problem to a sparse
    point the way proximal methods do — shrunk groups land NEAR zero,
    not AT it — which is why selection is by threshold, not by exact
    zeros.
    """
    cands = [sorted(set(int(v) for v in C)) for C in candidates]
    if any(len(C) < 2 for C in cands):
        raise ValueError("candidates must have size >= 2; singletons "
                         "are added automatically")
    cliques = [[v] for v in range(n)] + cands
    template = MRF.create(
        cliques, theta=np.full(sum(1 << len(C) for C in cliques), -0.1),
        beta=beta, n=n)
    mu_hat = _data_moments(template, data)
    lnZ_fn = make_lnz_fn(template, mesh=mesh)
    penalty = _interaction_penalty(template)
    opt = optax.adam(learning_rate)
    raw = _from_theta(template.theta, nonpositive)
    opt_state = opt.init(raw)

    @jax.jit
    def step(raw, opt_state):
        def loss_fn(r):
            theta = _to_theta(r, nonpositive)
            nll = lnZ_fn(theta) - beta * jnp.vdot(theta, mu_hat)
            return nll + lam * penalty(theta)

        loss, g = jax.value_and_grad(loss_fn)(raw)
        updates, opt_state = opt.update(g, opt_state, raw)
        return optax.apply_updates(raw, updates), opt_state, loss

    for _ in range(steps):
        raw, opt_state, _ = step(raw, opt_state)

    theta1 = _to_theta(raw, nonpositive)
    norms = interaction_norms(template, theta1)
    cand_norms = norms[n:]  # first n groups are the singletons
    cut = float(prune_tol)
    selected = [C for C, g in zip(cands, cand_norms) if g >= cut]

    keep = [[v] for v in range(n)] + selected
    refit = MRF.create(
        keep, theta=np.full(sum(1 << len(C) for C in keep), -0.1),
        beta=beta, n=n)
    mu_refit = _data_moments(refit, data)
    lnZ_refit = make_lnz_fn(refit, mesh=mesh)
    raw2 = _from_theta(refit.theta, nonpositive)
    opt2 = optax.adam(learning_rate)
    st2 = opt2.init(raw2)

    @jax.jit
    def refit_step(raw, opt_state):
        def loss_fn(r):
            theta = _to_theta(r, nonpositive)
            return lnZ_refit(theta) - beta * jnp.vdot(theta, mu_refit)

        loss, g = jax.value_and_grad(loss_fn)(raw)
        updates, opt_state = opt2.update(g, opt_state, raw)
        return optax.apply_updates(raw, updates), opt_state, loss

    nll = jnp.inf
    for _ in range(refit_steps):
        raw2, st2, nll = refit_step(raw2, st2)
    fitted = refit.with_theta(_to_theta(raw2, nonpositive))
    return StructureFit(mrf=fitted, selected=selected, group_norm=norms,
                        cliques=cliques, threshold=cut, nll=float(nll))
