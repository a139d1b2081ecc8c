"""Metrics: fidelity / KL / extract_probs parity with reference formulas."""

import numpy as np

import jax

from qcmrf_tpu.evaluation import metrics
from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.sim import analytic, sampler


def ref_fidelity(P, Q):
    F = 0.0
    for i in range(len(P)):
        if P[i] > 0 and Q[i] > 0:
            F += np.sqrt(P[i] * Q[i])
    return F ** 2


def ref_kl(P, Q):
    kl = 0.0
    for i in range(len(P)):
        if Q[i] > 0 and P[i] > 0:
            kl += P[i] * np.log(P[i] / Q[i])
    return kl


def test_fidelity_parity_including_zeros_and_negatives():
    rng = np.random.RandomState(0)
    P = rng.dirichlet(np.ones(16))
    Q = rng.dirichlet(np.ones(16))
    Q[3] = 0.0
    Q[5] = -0.01  # hardware quasi-probs can be negative
    P[7] = 0.0
    assert np.isclose(float(metrics.fidelity(P, Q)), ref_fidelity(P, Q), rtol=1e-6)
    assert np.isclose(float(metrics.kl(P, Q)), ref_kl(P, Q), rtol=1e-6)


def test_identical_distributions():
    P = np.ones(8) / 8
    assert np.isclose(float(metrics.fidelity(P, P)), 1.0, atol=1e-7)
    assert np.isclose(float(metrics.kl(P, P)), 0.0, atol=1e-9)


def test_extract_probs_parity():
    # counts over 2 ancilla bits + 2 variable bits
    R = {"0000": 40, "0001": 30, "0010": 20, "0011": 10,
         "0100": 50, "1000": 25, "1111": 5}
    P, delta = metrics.extract_probs(R, n=2, a=2)
    want = np.array([40, 30, 20, 10], dtype=float)
    np.testing.assert_allclose(P, want / want.sum())
    assert np.isclose(delta, 100 / 180)


def test_extract_probs_empty_acceptance():
    R = {"1100": 7}
    P, delta = metrics.extract_probs(R, n=2, a=2)
    assert delta == 0
    np.testing.assert_array_equal(P, np.zeros(4))


def test_postselect_dense_matches_extract_probs():
    rng = np.random.RandomState(1)
    mrf = MRF.create([[0, 1]], theta=-np.abs(rng.randn(4)))
    probs = np.asarray(analytic.joint_outcome_probs(mrf))
    width = mrf.n + mrf.num_cliques + 1
    counts = {format(i, f"0{width}b"): float(p)
              for i, p in enumerate(probs) if p > 0}
    P1, d1 = metrics.extract_probs(counts, mrf.n, width - mrf.n)
    P2, Z2 = metrics.postselect_dense(probs, mrf.n)
    np.testing.assert_allclose(P1, np.asarray(P2), atol=1e-6)
    assert np.isclose(d1, float(Z2), atol=1e-6)  # total mass is 1 here


def test_sampled_counts_roundtrip():
    rng = np.random.RandomState(2)
    mrf = MRF.create([[0, 1], [1, 2]], theta=-np.abs(rng.randn(8)) * 0.3)
    probs = analytic.joint_outcome_probs(mrf)
    width = mrf.n + mrf.num_cliques + 1
    counts = sampler.sample_counts(jax.random.PRNGKey(0), probs, 20000, width)
    assert sum(counts.values()) == 20000
    assert all(len(k) == width for k in counts)
    emp = sampler.counts_to_probs(counts, width)
    f = float(metrics.fidelity(np.asarray(probs), emp))
    assert f > 0.995
