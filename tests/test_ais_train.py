"""--grad ais: training in the past-both-exact-caps regime (verdict #2).

The model-moment term of the NLL gradient comes from AIS clique
marginals (models/ais.py) — the only estimator reaching induced width >
the elimination cap AND n > the streaming cap simultaneously. These
tests pin (a) convergence of the library step on a model with an exact
oracle, (b) the ESS gate (collapsed weights skip the update), and
(c) CLI routing: the past-both-caps refusal now points to --grad ais
and --grad ais actually trains there. The genuine wide-AND-large
construction (no monkeypatched caps) lives in test_ais.py's slow tier.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from qcmrf_tpu.models import ais as mais
from qcmrf_tpu.models import elimination, moments
from qcmrf_tpu.models import sample as msample
from qcmrf_tpu.models import train as mtrain
from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.runners import train_cli


def test_ais_step_converges_to_moment_match():
    cliques = [[i, i + 1] for i in range(4)]
    template = MRF.create(cliques)
    rng = np.random.RandomState(0)
    true = template.with_theta(
        jnp.asarray(-np.abs(rng.randn(template.dimension)), jnp.float32))
    data = msample.sample_exact(jax.random.PRNGKey(0), true, 6000)
    from qcmrf_tpu.evaluation.estimators import (
        clique_marginals_from_samples)

    mu_hat = clique_marginals_from_samples(template, np.asarray(data))
    opt = optax.adam(0.1)
    raw = mtrain._from_theta(template.with_theta(
        jnp.full((template.dimension,), -0.5)).theta, True)
    opt_state = opt.init(raw)
    step = mtrain.make_ais_train_step(
        template, opt, mu_hat, num_chains=128, num_temps=24)
    key = jax.random.PRNGKey(1)
    for _ in range(80):
        key, sub = jax.random.split(key)
        raw, opt_state, info = step(raw, opt_state, sub)
    assert not info["skipped"] and info["ess"] > 12.8
    fitted = template.with_theta(mtrain._to_theta(raw, True))
    mu_fit = np.asarray(elimination.clique_marginals(fitted))
    # at the MLE stationary point E_model[phi] = mu_hat; the AIS-noise
    # floor at 128 chains leaves a few-percent wander
    assert np.abs(mu_fit - np.asarray(mu_hat)).max() < 0.06


def test_ais_step_ess_gate_skips(monkeypatch):
    template = MRF.create([[0, 1], [1, 2]])
    mu_hat = np.full((template.dimension,), 0.25)
    opt = optax.adam(0.1)
    raw = mtrain._from_theta(
        jnp.full((template.dimension,), -0.5), True)
    opt_state = opt.init(raw)

    def collapsed(key, m, **kw):
        return (jnp.full((m.dimension,), 0.5),
                {"ess": jnp.asarray(1.0), "log_weights": None})

    monkeypatch.setattr(mais, "ais_clique_marginals", collapsed)
    step = mtrain.make_ais_train_step(
        template, opt, mu_hat, num_chains=100, num_temps=8,
        ess_min_frac=0.1)
    raw2, _, info = step(raw, opt_state, jax.random.PRNGKey(0))
    assert info["skipped"] and info["ess"] == 1.0
    np.testing.assert_array_equal(np.asarray(raw2), np.asarray(raw))


@pytest.fixture()
def past_both_caps(monkeypatch):
    """Simulate the past-both-caps regime at toy size: width cap 1 (all
    pairwise models count as wide), streaming cap n=6, big-n path at
    n > 5 — so chain:8 has no exact training backend."""
    monkeypatch.setenv("QCMRF_BIG_N_THRESHOLD", "5")
    monkeypatch.setattr(mtrain, "_ELIM_WIDTH_CAP", 1)
    monkeypatch.setattr(moments, "_MAX_N", 6)


def test_cli_past_caps_refusal_points_to_ais(past_both_caps, tmp_path):
    with pytest.raises(SystemExit) as e:
        train_cli.main(["--graph", "chain:8", "--steps", "2",
                        "--samples", "200", "--platform", "cpu",
                        "--outdir", str(tmp_path)])
    assert "--grad ais" in str(e.value)


def test_cli_grad_ais_trains_past_caps(past_both_caps, tmp_path):
    out = train_cli.main(
        ["--graph", "chain:8", "--steps", "25", "--samples", "3000",
         "--lr", "0.1", "--grad", "ais", "--ais-chains", "96",
         "--ais-temps", "16", "--platform", "cpu",
         "--outdir", str(tmp_path)])
    doc = json.load(open(out))
    assert "final_ess" in doc and doc["final_ess"] > 9.6
    assert doc["ais_skipped_steps"] == 0
    # the fit moved toward the data moments (vs the -0.5 init)
    fitted = MRF.create(doc["cliques"], theta=np.asarray(doc["theta"]))
    data_bits = np.asarray(json.load(open(tmp_path / "data.json")))
    mu_hat = np.asarray(mtrain.empirical_moments_from_bits(
        MRF.create(doc["cliques"]), data_bits))
    mu_fit = np.asarray(elimination.clique_marginals(fitted))
    init = MRF.create(doc["cliques"],
                      theta=np.full_like(np.asarray(doc["theta"]), -0.5))
    mu_init = np.asarray(elimination.clique_marginals(init))
    assert (np.abs(mu_fit - mu_hat).max()
            < 0.5 * np.abs(mu_init - mu_hat).max())


def test_cli_grad_ais_mesh_chains_shard(past_both_caps, tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    out = train_cli.main(
        ["--graph", "chain:8", "--steps", "4", "--samples", "500",
         "--grad", "ais", "--ais-chains", "64", "--ais-temps", "8",
         "--mesh", "2x1", "--platform", "cpu",
         "--outdir", str(tmp_path)])
    doc = json.load(open(out))
    assert "final_ess" in doc
