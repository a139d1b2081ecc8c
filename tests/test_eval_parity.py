"""Golden-file parity: our evaluation harness on the stored reference
results must reproduce the BASELINE.md tables, and our simulator's counts
must evaluate the same as Aer's within shot noise."""

import numpy as np
import pytest

import jax

from qcmrf_tpu.evaluation.harness import evaluate_suite, load_result_dists
from qcmrf_tpu.models.suite import (
    load_suite,
    reference_models_path,
    reference_results_path,
)
from qcmrf_tpu.runners.run_experiment import run_suite


@pytest.fixture(scope="module")
def suite01(reference_root):
    return load_suite(reference_models_path(0.1, reference_root), 0.1)


def test_stored_simulation_scale01(reference_root, suite01):
    """Evaluating Aer's stored noiseless counts reproduces BASELINE.md:
    F in [0.999, 1.0] for all graphs, delta per-graph values."""
    dists, norm = load_result_dists(
        reference_results_path(0.1, "simulation", reference_root)
    )
    assert norm == 10_000
    results = evaluate_suite(suite01, dists=dists, norm=norm)
    want_delta = [0.928, 0.936, 0.794, 0.757, 0.923, 0.845, 0.927]
    for r, wd in zip(results, want_delta):
        assert r.mean_f >= 0.999 - 5e-4
        assert abs(r.mean_delta - wd) < 2e-3
        assert r.mean_kl < 0.005


# BASELINE.md golden rows: (scale, backend, mean fidelities, mean deltas)
GOLDEN = [
    (0.1, "torino",
     [0.995, 0.993, 0.989, 0.968, 0.996, 0.945, 0.986],
     [0.989, 0.760, 0.290, 0.198, 0.634, 0.294, 0.525]),
    (0.25, "torino",
     [0.995, 0.989, 0.970, 0.967, 0.991, 0.943, 0.982],
     [0.948, 0.638, 0.209, 0.128, 0.551, 0.324, 0.516]),
    (0.5, "torino",
     [0.990, 0.963, 0.938, 0.902, 0.978, 0.911, 0.969],
     [0.827, 0.554, 0.154, 0.082, 0.548, 0.299, 0.508]),
    (0.5, "simulation",
     None,
     [0.693, 0.733, 0.352, 0.273, 0.695, 0.458, 0.704]),
    (0.1, "sherbrooke",
     [0.999, 0.998, 0.989, 0.981, 0.999, 0.972, 0.998],
     [0.907, 0.613, 0.175, 0.087, 0.516, 0.272, 0.507]),
    (0.1, "ehningen",
     [1.000, 0.999, 0.988, 0.957, 0.998, 0.989, 0.997],
     [0.901, 0.595, 0.159, 0.087, 0.504, 0.256, 0.500]),
]


@pytest.mark.parametrize("scale,backend,want_f,want_d", GOLDEN)
def test_stored_results_reproduce_baseline(reference_root, scale, backend,
                                           want_f, want_d):
    """Every stored result file evaluates to its BASELINE.md row."""
    import os

    path = reference_results_path(scale, backend, reference_root)
    if not os.path.isfile(path):
        pytest.skip(f"no stored {backend} results at scale {scale}")
    suite = load_suite(reference_models_path(scale, reference_root), scale)
    dists, norm = load_result_dists(path)
    results = evaluate_suite(suite, dists=dists, norm=norm)
    for i, r in enumerate(results):
        if want_f is not None:
            assert abs(r.mean_f - want_f[i]) < 2e-3, (backend, scale, i)
        else:
            assert r.mean_f >= 0.997 - 5e-4
        assert abs(r.mean_delta - want_d[i]) < 2e-3, (backend, scale, i)


def test_our_simulation_matches_reference_eval(reference_root, suite01):
    """End-to-end: our analytic engine's sampled counts, pushed through the
    eval harness, match the reference's own Aer results within shot noise
    (BASELINE.json config 3 criterion: KL <= 1e-3-ish, F ~ 1)."""
    counts = run_suite(suite01, shots=10_000, engine="analytic", seed=7)
    assert len(counts) == 70
    results = evaluate_suite(suite01, dists=counts, norm=10_000)
    # vs the exact distribution: same quality as Aer's stored counts
    want_delta = [0.928, 0.936, 0.794, 0.757, 0.923, 0.845, 0.927]
    for r, wd in zip(results, want_delta):
        assert r.mean_f >= 0.998, (r.graph, r.mean_f)
        assert r.mean_kl <= 5e-3, (r.graph, r.mean_kl)
        # success rate is a physical quantity: must match Z/2^n closely
        assert abs(r.mean_delta - wd) < 0.02, (r.graph, r.mean_delta, wd)


def test_gibbs_and_pam_modes_run(reference_root, suite01):
    """Classical-sampler comparison modes produce sane fidelity."""
    small = type(suite01)(
        graphs=suite01.graphs[:2],
        thetas={0: suite01.thetas[0][:2], 1: suite01.thetas[1][:2]},
        scale=0.1,
    )
    res_g = evaluate_suite(small, mode="gibbs", num_samples=3000,
                           key=jax.random.PRNGKey(3))
    for r in res_g:
        assert r.mean_f > 0.99
    res_p = evaluate_suite(small, mode="pam", num_samples=2000,
                           key=jax.random.PRNGKey(4))
    for r in res_p:
        assert r.mean_f > 0.8  # PAM is approximate
    # reference success-column semantics (eval.py:95-113): delta-hat is
    # ALWAYS histogrammed-count / 10 000 regardless of sample count — a
    # thinned Gibbs chain of 999 prints 0.0999, pam of 2000 prints 0.2
    for r in res_g:
        assert abs(r.mean_delta - 0.3) < 1e-9
    for r in res_p:
        assert abs(r.mean_delta - 0.2) < 1e-9


def test_gibbs_reference_thinned_count_quirk(reference_root, suite01):
    """The exact reference quirk: px.sample default chain thinned by 10
    minus the first sample -> 999 histogrammed samples -> delta-hat
    0.0999 over the fixed 10 000 norm (/root/reference/eval.py:96-104)."""
    small = type(suite01)(
        graphs=suite01.graphs[:1], thetas={0: suite01.thetas[0][:1]},
        scale=0.1,
    )
    res = evaluate_suite(small, mode="gibbs", num_samples=999,
                         key=jax.random.PRNGKey(5))
    assert abs(res[0].mean_delta - 0.0999) < 1e-9


def test_high_shot_kl_beats_reference_noise_floor(reference_root, suite01):
    """At 10k shots the reference's KL floor is ~1e-3..5e-3 (BASELINE.md).
    Our sampler at 400k shots pushes KL an order of magnitude below it —
    the BASELINE.json 'KL <= 1e-3' target with margin."""
    from qcmrf_tpu.models.mrf import MRF
    from qcmrf_tpu.sim import analytic, sampler
    from qcmrf_tpu.evaluation import metrics

    j = 3  # chain-4, the worst-KL graph in BASELINE.md (0.0018 at 10k)
    C = suite01.graphs[j]
    mrf = MRF.create(C, theta=suite01.thetas[j][0])
    width = mrf.n + mrf.num_cliques + 1
    probs = analytic.joint_outcome_probs(mrf)
    counts = sampler.sample_counts(
        jax.random.PRNGKey(0), probs, 400_000, width
    )
    q, _ = metrics.extract_probs(counts, mrf.n, width - mrf.n)
    p = np.asarray(mrf.gibbs_probs())
    assert float(metrics.kl(p, q)) < 3e-4
