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
