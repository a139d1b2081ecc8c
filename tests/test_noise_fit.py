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
