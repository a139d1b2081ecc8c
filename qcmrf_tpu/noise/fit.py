"""Calibrate the noise emulation against stored hardware results.

BASELINE.json config 4 asks for noise channels "parameterized to reproduce
the statistics behind result_torino/result_sherbrooke.json". This module
fits the per-2q-gate depolarizing rate so the emulator's expected
per-graph **success rates** match the measured ones.

Why success rate and not fidelity: a global depolarizing channel leaks
mass uniformly over the full key register; at scale 0.1 the exact Gibbs
distribution is itself near-uniform, so *any* amount of uniform mixing
leaves the post-selected Bhattacharyya fidelity ~1 — the measured
sub-unity hardware fidelities come from structured, circuit-correlated
errors no isotropic channel family can express. The acceptance rate,
however, is strongly and monotonically driven by depolarization (leaked
mass lands mostly on rejected ancilla patterns: only 2^n of 2^(n+K+1) keys
are accepted), which is exactly the δ̂ collapse visible in the stored
tables (e.g. chain-4 at scale 0.1: 0.757 noiseless → 0.198 on torino).

Expected (infinite-shot) statistics of the depolarized emulator have
closed forms per rep, so a scalar golden-section search suffices; readout
error needs no fitting against mitigated data (the tensored inverse-
confusion mitigation cancels the confusion channel exactly in
expectation).

Limits, honestly: one global rate reproduces the *trend* (acceptance
collapsing with circuit size, torino 0.1 residual ~0.17), not per-graph
idiosyncrasies — the stored tables show mitigation leakage pushing small
graphs ABOVE their noiseless success rate (SURVEY.md §6), which no
physical channel family can emit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import numpy as np

from qcmrf_tpu.circuits.compiler import compile_qcmrf
from qcmrf_tpu.circuits.lower import basis_gate_counts
from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.noise.backends import NoiseModel
from qcmrf_tpu.noise.channels import ReadoutError


def _suite_constants(suite):
    """Per-rep (ncx, noiseless delta, accepted-key fraction) — everything
    the expected-success formula needs that is independent of p_dep, so a
    fit's ~40 loss evaluations don't recompile/relower 70 circuits each."""
    consts = []
    for j, C in enumerate(suite.graphs):
        reps = []
        for theta in suite.thetas[j]:
            mrf = MRF.create(C, theta=theta)
            width = mrf.n + mrf.num_cliques + 1
            ncx = basis_gate_counts(compile_qcmrf(mrf)).get("cx", 0)
            reps.append((ncx, float(mrf.success_rate()),
                         (1 << mrf.n) / (1 << width)))
        consts.append(reps)
    return consts


def _expected_success_from_constants(consts, p_dep: float) -> List[float]:
    out = []
    for reps in consts:
        deltas = [
            (1.0 - p_dep) ** ncx * delta
            + (1.0 - (1.0 - p_dep) ** ncx) * frac
            for ncx, delta, frac in reps
        ]
        out.append(float(np.mean(deltas)))
    return out


def expected_graph_success(suite, p_dep: float) -> List[float]:
    """Per-graph mean success rate of the depolarized emulator (exact)."""
    return _expected_success_from_constants(_suite_constants(suite), p_dep)


def measured_graph_success(suite, dists, norm: float) -> List[float]:
    from qcmrf_tpu.evaluation.harness import evaluate_suite

    return [r.mean_delta
            for r in evaluate_suite(suite, dists=dists, norm=norm)]


def fit_depolarizing_rate(
    suite, dists, norm: float = 1.0,
    lo: float = 1e-5, hi: float = 0.05, iters: int = 40,
    target: List[float] = None,
) -> Tuple[float, float]:
    """Golden-section fit of p_dep to the measured per-graph success rates.

    Returns (p_dep, rms residual over the graphs).
    """
    if target is None:
        target = measured_graph_success(suite, dists, norm)
    target = np.asarray(target)
    consts = _suite_constants(suite)  # circuit stats computed once

    def loss(p):
        got = np.asarray(_expected_success_from_constants(consts, p))
        return float(np.mean((got - target) ** 2))

    invphi = (math.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c = b - invphi * (b - a)
    d = a + invphi * (b - a)
    fc, fd = loss(c), loss(d)
    for _ in range(iters):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - invphi * (b - a)
            fc = loss(c)
        else:
            a, c, fc = c, d, fd
            d = a + invphi * (b - a)
            fd = loss(d)
    p = (a + b) / 2.0
    return p, math.sqrt(loss(p))


def fit_noise_model(
    name: str, suite, dists, norm: float = 1.0,
    readout: ReadoutError = ReadoutError(0.012, 0.028),
) -> Tuple[NoiseModel, float]:
    """Fit a full NoiseModel to a stored mitigated result file."""
    p, rms = fit_depolarizing_rate(suite, dists, norm)
    return NoiseModel(name=name, p_dep_2q=p, readout=readout,
                      mitigated=True), rms


# --------------------------------------------------------------------------
# Per-graph calibration: reproduce the stored (F-bar, delta-hat) tables
# --------------------------------------------------------------------------
#
# The isotropic family above reproduces only the delta-hat *trend* (see the
# module docstring). Landing on the stored per-graph hardware statistics
# (res_*/result_torino.json etc., reference run_experiment.py:65-68) needs
# two per-graph knobs that are *orthogonal* under the reference's eval:
#
# * ``var_bias`` — asymmetric flip noise restricted to the VARIABLE
#   register (a proxy for accumulated gate error on the data qubits). It
#   moves mass only within the accepted/rejected blocks, so delta-hat is
#   untouched, while the post-selected conditional becomes a biased-channel
#   image of the Gibbs distribution — lowering the Bhattacharyya fidelity
#   by exactly a fittable amount even when p is near-uniform (scale 0.1),
#   which no uniform-mixing channel can do (F(p, uniform) ~ 0.999 there).
# * ``anc_drop`` / ``anc_boost`` — acceptance-rate scaling via the ancilla
#   register. True 0->1 ancilla readout flips (unmitigated) scale the
#   accepted mass by (1-drop)^K; a *mismatched* mitigation that inverts a
#   confusion that was never applied scales it by (1-boost)^-K — the
#   "mitigation leakage" that pushes small-graph delta-hat ABOVE noiseless
#   in the stored tables (SURVEY.md §6). Neither changes the accepted
#   conditional (the scaling is uniform over accepted keys), so F-bar is
#   untouched.
#
# Both knobs therefore solve independently: delta in closed form, F-bar by
# a monotone 1-D bisection on exact expected distributions (width <= 10).


@dataclasses.dataclass(frozen=True)
class GraphCalibration:
    var_bias: float   # e01 flip rate on variable bits (e10 = 0)
    anc_drop: float   # true unmitigated e01 on ancilla bits (delta down)
    anc_boost: float  # assumed-but-never-applied e01 inverted by
    #                   mitigation on ancilla bits (delta up)


@dataclasses.dataclass(frozen=True)
class CalibratedNoiseModel:
    """Per-graph calibration + a small symmetric true readout error that
    the mitigation inverts *exactly* (cancels in expectation but puts the
    finite-shot negative-quasi-probability signature of the stored
    hardware files into the output)."""

    name: str
    readout_sym: float
    graphs: Tuple[GraphCalibration, ...]


def _bias_image(p: np.ndarray, b: float) -> np.ndarray:
    """Image of an n-bit pmf under per-bit confusion [[1-b, 0], [b, 1]].

    Numpy mirror of ``channels.apply_bit_matrix`` (same column-stochastic
    convention and einsum — keep them in lockstep): the bisection below
    calls this hundreds of times per graph in a host loop, where per-bit
    jnp dispatches would dominate."""
    n = int(math.log2(p.size))
    q = p.astype(np.float64)
    M = np.array([[1.0 - b, 0.0], [b, 1.0]])
    for bit in range(n):
        lo, hi = 1 << bit, 1 << (n - 1 - bit)
        q = np.einsum("mt,htl->hml", M, q.reshape(hi, 2, lo)).reshape(-1)
    return q


def _fit_graph(ps, K: int, delta0: float, target_f: float,
               target_delta: float, bias_hi: float,
               iters: int) -> GraphCalibration:
    """Fit one graph's calibration from its exact per-rep Gibbs pmfs
    ``ps``, clique count ``K`` and mean noiseless acceptance ``delta0``
    (precomputed once — the refine loop re-enters with new targets
    only)."""
    from qcmrf_tpu.evaluation.metrics import fidelity

    # --- delta knob: closed form ---------------------------------------
    c = max(target_delta, 1e-9) / delta0
    if c <= 1.0:
        anc_drop, anc_boost = 1.0 - c ** (1.0 / K), 0.0
    else:
        anc_drop, anc_boost = 0.0, 1.0 - c ** (-1.0 / K)

    # --- F-bar knob: monotone bisection on the exact expectation --------
    target_f = min(target_f, 1.0)

    def mean_f(b):
        return float(np.mean([float(fidelity(p, _bias_image(p, b)))
                              for p in ps]))

    lo, hi = 0.0, bias_hi
    if mean_f(hi) > target_f:
        b = hi  # saturated: target below the family's floor
    else:
        for _ in range(iters):
            mid = 0.5 * (lo + hi)
            if mean_f(mid) > target_f:
                lo = mid
            else:
                hi = mid
        b = 0.5 * (lo + hi)
    return GraphCalibration(var_bias=b, anc_drop=anc_drop,
                            anc_boost=anc_boost)


def fit_calibrated(
    name: str, suite, dists, norm: float = 1.0,
    readout_sym: float = 0.01, bias_hi: float = 0.75, iters: int = 50,
    refine: int = 1, shots: int = 10_000,
) -> CalibratedNoiseModel:
    """Fit per-graph (var_bias, anc_drop/boost) to a stored result file so
    the emulator reproduces its per-graph mean fidelity and success rate
    (targets computed through the same evaluation harness the reference
    uses on the stored data).

    ``refine`` extra passes correct for the finite-shot bias of the
    Bhattacharyya estimator: at 10 000 shots a low-acceptance graph's
    measured F-bar sits below the infinite-shot expectation the bisection
    fits (sqrt is concave; mitigation amplifies the multinomial noise), so
    each pass re-fits against a target shifted by the measured gap on a
    fixed-seed emulator run.
    """
    from qcmrf_tpu.evaluation.harness import evaluate_suite

    targets = evaluate_suite(suite, dists=dists, norm=norm)
    goal_f = [t.mean_f for t in targets]
    goal_d = [t.mean_delta for t in targets]
    eff_f = list(goal_f)
    eff_d = list(goal_d)

    # exact per-rep Gibbs pmfs and noiseless acceptance, computed ONCE —
    # refine passes only change the targets, not the models
    graph_consts = []
    for j, C in enumerate(suite.graphs):
        mrfs = [MRF.create(C, theta=t) for t in suite.thetas[j]]
        graph_consts.append((
            [np.asarray(m.gibbs_probs(), np.float64) for m in mrfs],
            mrfs[0].num_cliques,
            float(np.mean([float(m.success_rate()) for m in mrfs])),
        ))

    def fit_pass():
        cals = [
            _fit_graph(ps, K, delta0, eff_f[j], eff_d[j], bias_hi, iters)
            for j, (ps, K, delta0) in enumerate(graph_consts)
        ]
        return CalibratedNoiseModel(name=name, readout_sym=readout_sym,
                                    graphs=tuple(cals))

    model = fit_pass()
    for _ in range(refine):
        import jax

        from qcmrf_tpu.noise.backends import run_calibrated_suite

        out = run_calibrated_suite(jax.random.PRNGKey(0), suite, model,
                                   shots=shots)
        got = evaluate_suite(suite, dists=out["quasi_dists"], norm=1)
        for j in range(len(suite.graphs)):
            eff_f[j] += goal_f[j] - got[j].mean_f
            eff_d[j] *= goal_d[j] / max(got[j].mean_delta, 1e-9)
        model = fit_pass()
    return model
