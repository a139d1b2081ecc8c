"""Shot-based partition-function and clique-marginal estimation
(BASELINE.json config 2: triangle and 4-clique MRFs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qcmrf_tpu.evaluation import estimators
from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.models.suite import load_suite, reference_models_path
from qcmrf_tpu.sim import analytic, sampler


@pytest.mark.parametrize("cliques", [[[0, 1, 2]], [[0, 1, 2, 3]]])
def test_estimate_from_circuit(cliques):
    rng = np.random.RandomState(0)
    probe = MRF.create(cliques)
    mrf = MRF.create(cliques, theta=-np.abs(rng.randn(probe.dimension)) * 0.25)
    lnZ, marg, delta = estimators.estimate_from_circuit(
        jax.random.PRNGKey(1), mrf, 200_000
    )
    assert np.isclose(lnZ, float(mrf.log_partition()), atol=0.01)
    assert np.isclose(delta, float(mrf.success_rate()), atol=0.005)
    exact = np.asarray(estimators.clique_marginals_exact(mrf))
    np.testing.assert_allclose(marg, exact, atol=0.01)


def test_exact_marginals_match_bruteforce():
    rng = np.random.RandomState(1)
    mrf = MRF.create([[0, 1], [1, 2]], theta=-np.abs(rng.randn(8)))
    got = np.asarray(estimators.clique_marginals_exact(mrf))
    p = np.asarray(mrf.gibbs_probs())
    phis = np.asarray(mrf.phi(jnp.arange(8, dtype=jnp.int32)))
    np.testing.assert_allclose(got, p @ phis, atol=1e-5)
    # marginals sum to 1 per clique block
    assert np.isclose(got[:4].sum(), 1.0, atol=1e-5)
    assert np.isclose(got[4:].sum(), 1.0, atol=1e-5)


def test_counts_based_estimators(reference_root):
    """From sampled counts dicts (the stored-file format)."""
    suite = load_suite(reference_models_path(0.25, reference_root), 0.25)
    C = suite.graphs[4]  # triangle [[0,1,2]]
    mrf = MRF.create(C, theta=suite.thetas[4][0])
    probs = analytic.joint_outcome_probs(mrf)
    width = mrf.n + mrf.num_cliques + 1
    counts = sampler.sample_counts(jax.random.PRNGKey(2), probs, 100_000,
                                   width)
    lnZ = estimators.log_partition_from_counts(counts, mrf.n)
    assert np.isclose(lnZ, float(mrf.log_partition()), atol=0.02)
    delta = estimators.success_rate_from_counts(counts, mrf.n)
    assert np.isclose(delta, float(mrf.success_rate()), atol=0.01)


def test_empty_acceptance_edge_cases():
    assert estimators.success_rate_from_counts({}, 2) == 0.0
    assert estimators.log_partition_from_counts({"1100": 5}, 2) == float("-inf")
    assert estimators.log_partition_from_parts(np.array([1, 2, 3]), 4) == float("-inf")


def test_exact_marginals_large_n():
    """n=20 grid marginals via the chunked gather-free path: per-clique
    blocks sum to 1 and match shot estimates."""
    from qcmrf_tpu.models.mrf import grid_mrf
    from qcmrf_tpu.sim import analytic

    rng = np.random.RandomState(2)
    mrf = grid_mrf(4, 5)
    mrf = mrf.with_theta(
        jnp.asarray(-np.abs(rng.randn(mrf.dimension)) * 0.1, jnp.float32)
    )
    marg = np.asarray(estimators.clique_marginals_exact(mrf))
    # each clique's 4 marginals sum to 1
    for off in range(0, mrf.dimension, 4):
        assert np.isclose(marg[off: off + 4].sum(), 1.0, atol=1e-4)
    # agrees with empirical post-selected marginals
    x, acc = analytic.sample_postselected(jax.random.PRNGKey(0), mrf,
                                          400_000)
    emp = estimators.clique_marginals_from_samples(
        mrf, np.asarray(x), np.asarray(acc)
    )
    np.testing.assert_allclose(emp, marg, atol=0.01)
