"""Native C++ engine vs the JAX MRF core (cross-oracle validation)."""

import shutil

import numpy as np
import pytest

import jax

from qcmrf_tpu.models.mrf import MRF, chain_mrf, grid_mrf
from qcmrf_tpu.models import sample as msample

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def px():
    from qcmrf_tpu.native import kiopto

    return kiopto


def rand_mrf(cliques, seed=0, scale=0.6):
    rng = np.random.RandomState(seed)
    probe = MRF.create(cliques)
    return MRF.create(cliques, theta=-np.abs(rng.randn(probe.dimension)) * scale)


GRAPHS = [
    [[0]],
    [[0, 1]],
    [[0, 1], [1, 2], [2, 3]],
    [[0, 1], [1, 2], [2, 3], [3, 4]],
    [[0, 1, 2]],
    [[0, 1, 2], [2, 3, 4]],
    [[0, 1, 2, 3]],
]


def test_reference_api_surface(px):
    b = px.backend([[0, 1]], np.array([2, 2]), inference="exact")
    w = px.weights(b)
    assert w.shape == (4,)
    w[:] = [-0.1, -0.2, -0.3, -0.4]  # in-place write-through
    assert np.isclose(px.weights(b)[2], -0.3)
    with pytest.raises(ValueError):
        px.backend([[0, 1]], np.array([3, 3]))


@pytest.mark.parametrize("cliques", GRAPHS)
def test_logpot_and_partition_match_jax(px, cliques):
    mrf = rand_mrf(cliques, seed=11)
    b = px.backend(cliques, np.array([2] * mrf.n))
    px.weights(b)[:] = np.asarray(mrf.theta, np.float64)
    # logpot parity on every state
    for x in range(mrf.num_states):
        assert np.isclose(
            px.logpot(b, x), float(mrf.log_potential(x)), atol=1e-5
        )
    # lnZ via bucket elimination == lnZ via enumeration
    assert np.isclose(
        px.infer(b, task="partition"), float(mrf.log_partition()), atol=1e-5
    )


def test_partition_beyond_enumeration_structure(px):
    """Chain of 30 vars: elimination handles it instantly; cross-check
    against the transfer-matrix (exact) answer computed in numpy."""
    n = 30
    rng = np.random.RandomState(3)
    cliques = [[i, i + 1] for i in range(n - 1)]
    theta = -np.abs(rng.randn(4 * (n - 1)))
    b = px.backend(cliques, np.array([2] * n))
    px.weights(b)[:] = theta
    lnZ = px.infer(b)
    # transfer matrix: Z = 1^T (prod_k T_k) 1, T_k[y0,y1] = exp(theta)
    v = np.ones(2)
    scale = 0.0
    for k in range(n - 2, -1, -1):
        T = np.exp(theta[4 * k: 4 * k + 4]).reshape(2, 2)
        v = T @ v
        s = v.max()
        v /= s
        scale += np.log(s)
    want = scale + np.log(v.sum())
    assert np.isclose(lnZ, want, rtol=1e-8)


def test_map_matches_enumeration(px):
    mrf = rand_mrf([[0, 1], [1, 2], [2, 3]], seed=5, scale=1.5)
    b = px.backend(mrf.cliques, np.array([2] * mrf.n))
    px.weights(b)[:] = np.asarray(mrf.theta, np.float64)
    bits = px.map_state(b)
    xid = int("".join(str(int(v)) for v in bits), 2)
    want = int(msample.map_state(mrf))
    lp = np.asarray(mrf.all_log_potentials())
    assert np.isclose(lp[xid], lp[want], atol=1e-6)


def test_gibbs_sampler_distribution(px):
    mrf = rand_mrf([[0, 1], [1, 2]], seed=7)
    b = px.backend(mrf.cliques, np.array([2] * mrf.n))
    px.weights(b)[:] = np.asarray(mrf.theta, np.float64)
    S = px.sample(b, num=30_000, seed=123)
    ids = (S * (1 << np.arange(mrf.n - 1, -1, -1))).sum(1)
    emp = np.bincount(ids, minlength=mrf.num_states) / len(ids)
    np.testing.assert_allclose(
        emp, np.asarray(mrf.gibbs_probs()), atol=0.02
    )


def test_pam_sampler_mode(px):
    mrf = rand_mrf([[0, 1], [1, 2]], seed=8, scale=1.5)
    b = px.backend(mrf.cliques, np.array([2] * mrf.n))
    px.weights(b)[:] = np.asarray(mrf.theta, np.float64)
    S = px.sample(b, pam=True, num=2_000, seed=9)
    ids = (S * (1 << np.arange(mrf.n - 1, -1, -1))).sum(1)
    p = np.asarray(mrf.gibbs_probs())
    assert np.argmax(np.bincount(ids, minlength=mrf.num_states)) == np.argmax(p)


def test_eval_pipeline_with_native_oracle(px, reference_root):
    """Swap the native engine in as the exact-probability oracle and
    reproduce a BASELINE.md row (the reference's own eval flow, but with
    OUR native library standing in for kiopto_native)."""
    import json
    import os

    from qcmrf_tpu.evaluation import metrics
    from qcmrf_tpu.models.suite import load_suite, reference_models_path

    suite = load_suite(reference_models_path(0.1, reference_root), 0.1)
    with open(os.path.join(reference_root, "res_0.1",
                           "result_simulation.json")) as f:
        dists = json.load(f)

    j = 1  # graph [[0, 1]]
    fids = []
    for i, theta in enumerate(suite.thetas[j]):
        C = suite.graphs[j]
        n = 2
        N = 4
        b = px.backend(C, np.array([2] * n))
        px.weights(b)[:] = theta
        lnZ = px.infer(b, task="partition")
        p = np.array([np.exp(px.logpot(b, x) - lnZ) for x in range(N)])
        Q = dists[10 * j + i]
        q = np.zeros(N)
        Z = 0.0
        for k, v in Q.items():
            kid = int(k, 2)
            if kid < N:
                q[kid] = v
                Z += v
        q /= Z
        fids.append(min(float(metrics.fidelity(p, q)), 1.0))
    assert np.mean(fids) > 0.9995  # BASELINE.md: 1.000 +/- 0.000


def test_eval_harness_native_modes(px, reference_root):
    """gibbs/pam through the C++ engine inside the eval harness."""
    from qcmrf_tpu.evaluation.harness import evaluate_suite
    from qcmrf_tpu.models.suite import ModelSuite, load_suite, \
        reference_models_path

    full = load_suite(reference_models_path(0.1, reference_root), 0.1)
    small = ModelSuite(
        graphs=full.graphs[:2],
        thetas={0: full.thetas[0][:2], 1: full.thetas[1][:2]},
        scale=0.1,
    )
    res = evaluate_suite(small, mode="gibbs", num_samples=3000, native=True)
    assert all(r.mean_f > 0.99 for r in res)
    res_p = evaluate_suite(small, mode="pam", num_samples=1000, native=True)
    assert all(r.mean_f > 0.8 for r in res_p)


def test_isolated_trailing_variables(px):
    """n comes from len(states_per_var), like the reference kiopto: a
    trailing variable in no clique still contributes ln 2 to lnZ, a bit
    of sample width, and a logpot bit position."""
    b = px.backend([[0, 1]], np.array([2, 2, 2]))
    assert b.n == 3
    assert np.isclose(px.infer(b), 3 * np.log(2.0))  # zero weights
    S = px.sample(b, pam=True, num=4, seed=0)
    assert S.shape == (4, 3)
    # logpot reads variable 0 as MSB of a 3-bit id: only the [0,1] clique
    # contributes, via bits 2..1
    px.weights(b)[:] = [0.0, 0.0, 0.0, -1.0]
    assert np.isclose(px.logpot(b, 0b110), -1.0)
    assert np.isclose(px.logpot(b, 0b111), -1.0)
    assert np.isclose(px.logpot(b, 0b100), 0.0)


def test_gibbs_beyond_64_variables(px):
    """The per-variable-clique Gibbs sweep packs no state id, so n > 64
    works (the old packed-id sweep was undefined behavior there)."""
    n = 70
    b = px.backend([[i, i + 1] for i in range(n - 1)], np.array([2] * n))
    S = px.sample(b, num=300, seed=1)
    assert S.shape[1] == n
    # zero weights: each bit is a fair coin
    m = S.mean()
    assert 0.4 < m < 0.6, m


def test_empty_clique_rejected(px):
    with pytest.raises(ValueError, match="empty"):
        px.backend([[0, 1], []], np.array([2, 2]))
