"""Noise calibration against the stored hardware tables."""

import numpy as np
import pytest

from qcmrf_tpu.evaluation.harness import load_result_dists
from qcmrf_tpu.models.suite import (
    load_suite,
    reference_models_path,
    reference_results_path,
)
from qcmrf_tpu.noise import fit as nfit


@pytest.fixture(scope="module")
def torino01(reference_root):
    suite = load_suite(reference_models_path(0.1, reference_root), 0.1)
    dists, norm = load_result_dists(
        reference_results_path(0.1, "torino", reference_root)
    )
    return suite, dists, norm


def test_fit_recovers_synthetic_rate(reference_root):
    """Fitting against the emulator's own expected success rates recovers
    the generating p_dep."""
    suite = load_suite(reference_models_path(0.1, reference_root), 0.1)
    true_p = 0.0035
    target = nfit.expected_graph_success(suite, true_p)
    p, rms = nfit.fit_depolarizing_rate(suite, None, 1.0, target=target)
    assert abs(p - true_p) < 2e-4
    assert rms < 1e-4


def test_fit_torino_scale01(torino01):
    """Calibrated p_dep reproduces the stored torino acceptance falloff
    (e.g. chain-4: 0.757 noiseless -> 0.198 measured)."""
    suite, dists, norm = torino01
    p, rms = nfit.fit_depolarizing_rate(suite, dists, norm)
    assert 5e-4 < p < 0.02  # physically plausible per-cx rate
    # a single global rate can't capture per-graph effects like mitigation
    # leakage (graph [[0]] measures ABOVE noiseless), so assert the trend:
    # bounded residual + strong correlation with the measured pattern
    assert rms < 0.2
    target = np.asarray(nfit.measured_graph_success(suite, dists, norm))
    got = np.asarray(nfit.expected_graph_success(suite, p))
    assert np.corrcoef(target, got)[0, 1] > 0.5

    # fitted rate beats 2x-perturbed rates
    def rms_at(q):
        got = np.asarray(nfit.expected_graph_success(suite, q))
        return float(np.sqrt(np.mean((got - target) ** 2)))

    assert rms <= rms_at(p * 2) + 1e-9
    assert rms <= rms_at(p / 2) + 1e-9
    # the big-circuit collapse is reproduced: chain-4 emulated delta falls
    # by >2x from noiseless
    assert got[3] < 0.757 / 2


def test_fit_noise_model_roundtrip(torino01):
    suite, dists, norm = torino01
    model, rms = nfit.fit_noise_model("torino-fit", suite, dists, norm)
    assert model.mitigated
    assert model.p_dep_2q > 0


# --------------------------------------------------------------------------
# Per-graph calibration: the emulator must land ON the stored tables
# (VERDICT round-1 item 3: |dF| <= 0.01 and |d delta| <= 0.03 per graph)
# --------------------------------------------------------------------------


def _calibration_errors(reference_root, scale, backend, seed=7):
    import jax

    from qcmrf_tpu.evaluation.harness import evaluate_suite
    from qcmrf_tpu.noise.backends import run_calibrated_suite

    suite = load_suite(reference_models_path(scale, reference_root), scale)
    dists, norm = load_result_dists(
        reference_results_path(scale, backend, reference_root)
    )
    targets = evaluate_suite(suite, dists=dists, norm=norm)
    # iters=20 gives bias precision 0.75/2^20 ~ 7e-7 — orders below the
    # 0.01 assertion tolerance — at 2.5x less fit time than the default
    model = nfit.fit_calibrated(backend, suite, dists, norm, iters=20)
    out = run_calibrated_suite(jax.random.PRNGKey(seed), suite, model)
    got = evaluate_suite(suite, dists=out["quasi_dists"], norm=1)
    df = [abs(t.mean_f - g.mean_f) for t, g in zip(targets, got)]
    dd = [abs(t.mean_delta - g.mean_delta) for t, g in zip(targets, got)]
    negatives = sum(
        1 for d in out["quasi_dists"] for v in d.values() if v < 0
    )
    times = [m["readout_mitigation_time"] for m in out["metadata"]]
    return df, dd, negatives, times


@pytest.mark.parametrize("scale,backend", [
    (0.1, "torino"),
    pytest.param(0.25, "torino", marks=pytest.mark.slow),
    pytest.param(0.5, "torino", marks=pytest.mark.slow),
    pytest.param(0.1, "ehningen", marks=pytest.mark.slow),
])
def test_calibrated_reproduces_stored_tables(reference_root, scale, backend):
    df, dd, negatives, times = _calibration_errors(
        reference_root, scale, backend
    )
    assert max(df) <= 0.01, f"per-graph |dF|: {df}"
    assert max(dd) <= 0.03, f"per-graph |d delta|: {dd}"
    # the stored hardware files' statistical signatures are present too:
    # negative quasi-probabilities (only where the stored file robustly
    # shows them — torino has 107 at scale 0.1; ehningen only 8 and
    # sherbrooke 0, so absence there is faithful) and a measured
    # mitigation time
    if backend == "torino":
        assert negatives > 0
    assert all(t > 0 for t in times)


@pytest.mark.slow
def test_calibrated_sherbrooke(reference_root):
    df, dd, _, _ = _calibration_errors(reference_root, 0.1, "sherbrooke")
    assert max(df) <= 0.01 and max(dd) <= 0.03
