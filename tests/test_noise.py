"""Noise emulation: channels, mitigation, hardware-like statistics."""

import numpy as np

import jax
import jax.numpy as jnp

from qcmrf_tpu.evaluation.harness import evaluate_suite
from qcmrf_tpu.evaluation import metrics
from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.models.suite import ModelSuite
from qcmrf_tpu.noise import backends as nb
from qcmrf_tpu.noise.channels import (
    ReadoutError,
    apply_readout_confusion,
    depolarize,
    mitigation_overhead,
)
from qcmrf_tpu.noise.mitigation import mitigate_counts
from qcmrf_tpu.sim import analytic, sampler


def make_mrf(cliques, seed=0, scale=0.3):
    rng = np.random.RandomState(seed)
    probe = MRF.create(cliques)
    return MRF.create(cliques, theta=-np.abs(rng.randn(probe.dimension)) * scale)


def test_confusion_roundtrip():
    rng = np.random.RandomState(0)
    p = rng.dirichlet(np.ones(16))
    errs = [ReadoutError(0.02, 0.05)] * 4
    noisy = apply_readout_confusion(jnp.asarray(p), errs, 4)
    assert np.isclose(float(noisy.sum()), 1.0, atol=1e-6)
    assert not np.allclose(np.asarray(noisy), p)
    recovered = apply_readout_confusion(noisy, errs, 4, invert=True)
    np.testing.assert_allclose(np.asarray(recovered), p, atol=1e-6)


def test_depolarize_limits():
    p = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    out = depolarize(p, 0.0, 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(p))
    out2 = depolarize(p, 1.0, 1)
    np.testing.assert_allclose(np.asarray(out2), np.full(4, 0.25), atol=1e-7)
    # mass conserved
    out3 = depolarize(p, 0.01, 37)
    assert np.isclose(float(out3.sum()), 1.0, atol=1e-6)


def test_mitigation_produces_negative_quasiprobs():
    """Inverting confusion on sampled counts must (generically) produce
    some negative quasi-probabilities — the stored-hardware signature."""
    # chain-3 with readout-only noise: 8-bit keys with sparse support ->
    # zero-count keys adjacent to populated ones go negative under the
    # inverse-confusion map
    mrf = make_mrf([[0, 1], [1, 2], [2, 3]], seed=1)
    width = mrf.n + mrf.num_cliques + 1
    model = nb.preset("readout-only")
    key = jax.random.PRNGKey(0)
    counts = nb.sample_noisy_counts(key, mrf, model, 10_000)
    quasi, meta = mitigate_counts(counts, [model.readout] * width, width)
    total = sum(quasi.values())
    assert np.isclose(total, 1.0, atol=1e-6)
    assert meta["shots"] == 10_000
    assert meta["readout_mitigation_overhead"] > 1.0
    assert any(v < 0 for v in quasi.values())


def test_mitigated_fidelity_beats_raw():
    """Readout mitigation should improve fidelity to the ideal dist.

    Uses the readout-only preset: mitigation cannot undo depolarizing
    noise, so isolating the readout channel makes the improvement a
    deterministic property rather than a tuning accident."""
    mrf = make_mrf([[0, 1], [1, 2]], seed=2)
    width = mrf.n + mrf.num_cliques + 1
    model = nb.preset("readout-only")
    ideal = np.asarray(analytic.joint_outcome_probs(mrf))
    counts = nb.sample_noisy_counts(jax.random.PRNGKey(1), mrf, model, 50_000)
    raw = sampler.counts_to_probs(counts, width)
    quasi, _ = mitigate_counts(counts, [model.readout] * width, width)
    mitig = sampler.counts_to_probs(quasi, width)
    f_raw = float(metrics.fidelity(ideal, raw))
    f_mit = float(metrics.fidelity(ideal, mitig))
    assert f_mit > f_raw


def test_noisy_suite_statistics_hardware_like(reference_root):
    """Emulated torino run lands in the stored-hardware fidelity range:
    clearly below noiseless (F<1) but above 0.9, with fidelity decreasing
    for larger graphs (BASELINE.md torino pattern)."""
    from qcmrf_tpu.models.suite import load_suite, reference_models_path

    full = load_suite(reference_models_path(0.1, reference_root), 0.1)
    # 3 reps per graph keeps the test fast
    suite = ModelSuite(
        graphs=full.graphs,
        thetas={j: full.thetas[j][:3] for j in range(len(full.graphs))},
        scale=0.1,
    )
    model = nb.preset("torino")
    result = nb.run_noisy_suite(jax.random.PRNGKey(2), suite, model,
                                shots=10_000)
    assert set(result.keys()) == {"quasi_dists", "metadata"}
    assert len(result["quasi_dists"]) == 21
    dists = result["quasi_dists"]
    res = evaluate_suite(suite, dists=dists, norm=1)
    fs = [r.mean_f for r in res]
    assert all(0.9 < f <= 1.0 for f in fs), fs
    # small single-clique graph degrades less than the 5-var two-triangle
    assert fs[0] > fs[5]
    # negative entries exist somewhere across the suite
    assert any(v < 0 for d in dists for v in d.values())


def test_overhead_range_matches_reference():
    """Per-circuit mitigation overhead lands in the stored 1.13-2.68 range."""
    model = nb.preset("torino")
    for width in (3, 6, 10):
        ov = mitigation_overhead([model.readout] * width)
        assert 1.05 < ov < 3.0


def test_metadata_schema_superset_of_stored(reference_root):
    """Emitted metadata keys (and value types) must cover every key of the
    stored hardware rows (res_0.1/result_torino.json metadata[*]) —
    byte-level result-file schema parity."""
    import json

    import os

    stored = json.load(
        open(os.path.join(reference_root, "res_0.1", "result_torino.json"))
    )["metadata"]
    stored_keys = {k for row in stored for k in row}

    mrf = make_mrf([[0, 1]], seed=3)
    width = mrf.n + mrf.num_cliques + 1
    model = nb.preset("torino")
    counts = nb.sample_noisy_counts(jax.random.PRNGKey(4), mrf, model, 1000)
    _, meta = mitigate_counts(counts, [model.readout] * width, width)
    assert set(meta.keys()) >= stored_keys, (
        f"missing keys: {stored_keys - set(meta.keys())}"
    )
    for k in stored_keys:  # same JSON value types as the stored rows
        assert type(meta[k]) is type(stored[0][k]), (k, type(meta[k]))
