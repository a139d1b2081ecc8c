"""MLE training: recovers generating parameters; sharded == single-chip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from qcmrf_tpu.models import sample as msample
from qcmrf_tpu.models import train as mtrain
from qcmrf_tpu.models.mrf import MRF


def make_problem(seed=0):
    rng = np.random.RandomState(seed)
    true = MRF.create([[0, 1], [1, 2]], theta=-np.abs(rng.randn(8)) * 0.8)
    data = msample.sample_exact(jax.random.PRNGKey(seed), true, 20_000)
    return true, data


def test_fit_recovers_distribution():
    true, data = make_problem(1)
    init = true.with_theta(jnp.full((8,), -0.5))
    fitted, loss = mtrain.fit_mle(init, data, steps=400, learning_rate=0.05)
    p_true = np.asarray(true.gibbs_probs())
    p_fit = np.asarray(fitted.gibbs_probs())
    # distribution-level recovery (theta itself is not identifiable:
    # overcomplete one-hot features)
    np.testing.assert_allclose(p_fit, p_true, atol=0.01)
    assert float(loss) < float(init.nll(data))


def test_nonpositive_constraint_held():
    true, data = make_problem(2)
    init = true.with_theta(jnp.full((8,), -0.5))
    fitted, _ = mtrain.fit_mle(init, data, steps=100)
    assert np.all(np.asarray(fitted.theta) <= 0)


def test_sharded_step_matches_single(capsys):
    true, data = make_problem(3)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("amp", "data"))
    opt = optax.sgd(0.1)
    raw0 = mtrain._from_theta(jnp.full((8,), -0.5), True)

    single = mtrain.make_train_step(true, opt)
    shard = mtrain.make_sharded_train_step(true, opt, mesh)

    s_raw, s_os, s_loss = single(raw0, opt.init(raw0), data)
    m_raw, m_os, m_loss = shard(raw0, opt.init(raw0), data)
    assert np.isclose(float(s_loss), float(m_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_raw), np.asarray(m_raw), rtol=1e-4, atol=1e-6
    )


def test_fit_mle_sharded_runs():
    true, data = make_problem(4)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("amp", "data"))
    init = true.with_theta(jnp.full((8,), -0.5))
    fitted, loss = mtrain.fit_mle_sharded(
        init, data, mesh, steps=50, learning_rate=0.1
    )
    assert float(loss) < float(init.nll(data))
    assert np.all(np.asarray(fitted.theta) <= 0)


def test_fit_large_chain_via_elimination():
    """Exact MLE on a 28-variable chain: the NLL routes through variable
    elimination (2^28 enumeration would be prohibitive in a unit test)."""
    from qcmrf_tpu.models import sample as msample
    from qcmrf_tpu.models.mrf import chain_mrf

    n = 28
    rng = np.random.RandomState(7)
    true = chain_mrf(n, theta=-np.abs(rng.randn(4 * (n - 1))) * 0.8)
    data = msample.sample_gibbs(jax.random.PRNGKey(0), true, 4000,
                                thin=2, burn=50)
    init = true.with_theta(jnp.full((true.dimension,), -0.5))
    fitted, loss = mtrain.fit_mle(init, data, steps=150, learning_rate=0.1)
    assert float(loss) < float(mtrain._nll(init, init.theta, data))
    # edge marginals of the fit approach the data's empirical marginals
    from qcmrf_tpu.models import elimination as ve

    fit_marg = np.asarray(ve.clique_marginals(fitted))
    emp = np.asarray(true.phi(data)).mean(0)
    assert np.abs(fit_marg - emp).max() < 0.05


def test_fit_mle_shots_converges():
    """Shot-based (quantum-in-the-loop) MLE recovers a small model: the
    gradient's model-moment term comes only from post-selected circuit
    samples, never exact inference."""
    import jax

    from qcmrf_tpu.models import sample as msample
    from qcmrf_tpu.models.train import fit_mle_shots

    rng = np.random.RandomState(0)
    truth = MRF.create([[0, 1], [1, 2]],
                       theta=-np.abs(rng.randn(8)).astype(np.float32) * 0.8)
    data = msample.sample_exact(jax.random.PRNGKey(1), truth, 20_000)
    init = truth.with_theta(jnp.full((8,), -0.5))

    fitted, delta = fit_mle_shots(
        init, data, jax.random.PRNGKey(2), steps=150, shots=1 << 13,
        learning_rate=0.1,
    )
    p = np.asarray(truth.gibbs_probs(), np.float64)
    q = np.asarray(fitted.gibbs_probs(), np.float64)
    d = float(np.sum(p * np.log(p / q)))
    assert 0.0 < delta <= 1.0
    assert d < 0.02, d
