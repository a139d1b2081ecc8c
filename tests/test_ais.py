"""Annealed importance sampling: lnZ estimates for any structure/size.

The stochastic backend that serves where BOTH exact routes refuse
(induced width past elimination's cap AND n past the streaming sweeps'
n <= 47) — the same regime where the reference oracle (px, SURVEY.md
§2.3 N5) has no answer either.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qcmrf_tpu.models import ais, elimination
from qcmrf_tpu.models.mrf import MRF, chain_mrf, grid_mrf
from qcmrf_tpu.runners import infer_cli


def test_logpot_bits_matches_state_id_logpot():
    rng = np.random.RandomState(0)
    m = grid_mrf(3, 3)
    m = m.with_theta(jnp.asarray(
        -np.abs(rng.randn(m.dimension)).astype(np.float32)))
    for x in rng.randint(0, m.num_states, size=8):
        # variable v = bit (n-1-v) of the state id (utils/bits.py)
        bits = jnp.asarray(
            [(int(x) >> (m.n - 1 - v)) & 1 for v in range(m.n)],
            jnp.int32)
        assert np.isclose(float(ais.logpot_bits(m, bits)),
                          float(m.log_potential(int(x))), atol=1e-5)


def test_ais_matches_exact_small():
    rng = np.random.RandomState(1)
    m = grid_mrf(3, 3)
    m = m.with_theta(jnp.asarray(
        -np.abs(rng.randn(m.dimension)).astype(np.float32) * 0.4))
    exact = float(m.log_partition())
    lnz, diag = ais.ais_log_partition(
        jax.random.PRNGKey(0), m, num_chains=256, num_temps=128,
        return_diagnostics=True)
    se = float(diag["stderr"])
    assert abs(float(lnz) - exact) < max(4 * se, 0.02)
    ess = float(diag["ess"])
    assert 1.0 < ess <= 256.0
    assert diag["log_weights"].shape == (256,)


def test_ais_matches_elimination_large_chain():
    # n = 40 is past the 2^n table; elimination is the exact oracle
    rng = np.random.RandomState(2)
    m = chain_mrf(40)
    m = m.with_theta(jnp.asarray(
        -np.abs(rng.randn(m.dimension)).astype(np.float32) * 0.3))
    exact = float(elimination.log_partition(m))
    lnz, diag = ais.ais_log_partition(
        jax.random.PRNGKey(1), m, num_chains=128, num_temps=96,
        return_diagnostics=True)
    assert abs(float(lnz) - exact) < max(4 * float(diag["stderr"]), 0.05)


def test_ais_beta_scaling():
    # lnZ(beta) depends on beta through the annealing target; at
    # beta=0 every weight is exactly 0 and lnZ = n ln 2 bit-exactly
    m = chain_mrf(6, beta=0.0)
    m = m.with_theta(jnp.full((m.dimension,), -1.0, jnp.float32))
    lnz = ais.ais_log_partition(
        jax.random.PRNGKey(0), m, num_chains=16, num_temps=8)
    assert float(lnz) == pytest.approx(6 * np.log(2.0), abs=1e-6)


def test_ais_marginals_match_exact():
    rng = np.random.RandomState(5)
    m = grid_mrf(3, 3)
    m = m.with_theta(jnp.asarray(
        -np.abs(rng.randn(m.dimension)).astype(np.float32) * 0.4))
    exact = np.asarray(elimination.clique_marginals(m))
    mu, diag = ais.ais_clique_marginals(
        jax.random.PRNGKey(0), m, num_chains=512, num_temps=96,
        return_diagnostics=True)
    mu = np.asarray(mu)
    # each clique table's weighted scatter sums to 1 exactly
    tabs = mu.reshape(-1, 4)
    assert np.allclose(tabs.sum(1), 1.0, atol=1e-5)
    # elementwise MC tolerance at 512 chains (~1/sqrt(ESS) scale)
    assert float(diag["ess"]) > 64
    assert np.max(np.abs(mu - exact)) < 0.08
    assert np.mean(np.abs(mu - exact)) < 0.02


def _wide_past_cap_model(theta_scale: float):
    """n=48 with a K27 complete subgraph: induced width 26 > the
    elimination cap AND n > the streaming sweeps' 47 — both exact
    backends refuse, AIS is the only lnZ route."""
    n = 48
    cliques = [[i, j] for i in range(27) for j in range(i + 1, 27)]
    cliques += [[i, i + 1] for i in range(26, n - 1)]
    m = MRF.create(cliques)
    rng = np.random.RandomState(3)
    return m.with_theta(jnp.asarray(
        -np.abs(rng.randn(m.dimension)).astype(np.float32) * theta_scale))


def _disjoint_blocks():
    """The round-4 verdict's flagship-regime construction with a
    NONTRIVIAL exact target: block A = complete pairwise graph on 27
    variables (induced width 27 > the elimination cap), block B = a
    disjoint 21-variable chain; the joint model has n = 48 > the
    streaming cap, so BOTH exact backends refuse — yet exact lnZ and
    clique marginals decompose over the disjoint blocks, where block A
    fits the streaming sweeps (n=27) and block B fits elimination.
    Coupling scale 0.3: the trivial theta<=0 bracket spans ~80+ nats
    here, so the pin below (4 stderr ~ 0.1 nats) has real teeth."""
    A = [[i, j] for i in range(27) for j in range(i + 1, 27)]
    B = [[i, i + 1] for i in range(20)]  # 21-var chain, standalone ids
    tA, tB = MRF.create(A), MRF.create(B)
    joint = MRF.create(A + [[i + 27, j + 27] for i, j in B])
    rng = np.random.RandomState(1)
    theta = (-np.abs(rng.randn(joint.dimension)) * 0.3).astype(np.float32)
    mA = tA.with_theta(jnp.asarray(theta[:tA.dimension]))
    mB = tB.with_theta(jnp.asarray(theta[tA.dimension:]))
    return joint.with_theta(jnp.asarray(theta)), mA, mB, tA.dimension


@pytest.mark.slow  # K27 streaming sweeps + n=48 AIS compiles (~4 min)
def test_ais_past_both_caps_nontrivial_pin_and_training():
    """Verdict items 2+3 in one construction (the expensive n=27
    streaming-moments compile is shared): (a) AIS lnZ and marginals hit
    a nontrivial exact target within their own error bars in the regime
    AIS exists for; (b) --grad-ais training converges there, validated
    against per-block exact inference (first-order stationarity of the
    exact per-block NLL at the AIS fit, plus a real elimination fit of
    the chain block)."""
    from qcmrf_tpu.models import elimination, moments
    from qcmrf_tpu.models import train as mtrain

    joint, mA, mB, dA = _disjoint_blocks()

    # --- exact targets from the disjoint-block decomposition ----------
    lnz_exact = (float(moments.log_partition_streaming(mA))
                 + float(elimination.log_partition(mB)))
    muA = np.asarray(moments.clique_moments_streaming(mA))
    muB = np.asarray(elimination.clique_marginals(mB))
    mu_exact = np.concatenate([muA, muB])
    # nontriviality: the theta<=0 upper bound n ln 2 is far away
    assert 48 * np.log(2.0) - lnz_exact > 10.0

    # --- (a) the accuracy pin -----------------------------------------
    lnz, diag = ais.ais_log_partition(
        jax.random.PRNGKey(0), joint, num_chains=256, num_temps=96,
        return_diagnostics=True)
    ess, stderr = float(diag["ess"]), float(diag["stderr"])
    assert ess > 25.6, "collapsed weights would void the pin"
    assert abs(float(lnz) - lnz_exact) <= max(4 * stderr, 5e-3)

    # self-normalized IS noise per entry at 256 chains is ~0.03; a
    # max-norm over 1484 entries needs better statistics, so pool 4
    # independent runs (warm: the program is compiled once)
    mus = []
    for k in (1, 2, 3, 4):
        mu_ais, mdiag = ais.ais_clique_marginals(
            jax.random.PRNGKey(k), joint, num_chains=256, num_temps=96,
            return_diagnostics=True)
        assert float(mdiag["ess"]) > 25.6
        mus.append(np.asarray(mu_ais))
    err = np.abs(np.mean(mus, axis=0) - mu_exact)
    assert err.max() < 0.06 and err.mean() < 0.015

    # --- (b) training through AIS moments, vs exact inference ---------
    import optax

    template = MRF.create([list(C) for C in joint.cliques])
    # annealed lr: the stationary wander of stochastic moment matching
    # scales with lr x estimator noise; the final low-lr phase tightens
    # the fit to the AIS noise floor
    opt = optax.adam(optax.piecewise_constant_schedule(
        0.08, {60: 0.25}))
    raw = mtrain._from_theta(
        jnp.full((template.dimension,), -0.5), True)
    opt_state = opt.init(raw)
    step = mtrain.make_ais_train_step(
        template, opt, jnp.asarray(mu_exact, jnp.float32),
        num_chains=256, num_temps=96)
    key = jax.random.PRNGKey(2)
    skips = 0
    tail = []  # Polyak tail-average: the converged iterates wander at
    #            the (lr x AIS-noise) scale; averaging the last 30
    #            shrinks it ~sqrt(30) below the assertion bars
    for step_i in range(100):
        key, sub = jax.random.split(key)
        raw, opt_state, info = step(raw, opt_state, sub)
        skips += int(info["skipped"])
        if step_i >= 70:
            tail.append(np.asarray(mtrain._to_theta(raw, True)))
    assert skips < 20, "persistent ESS-gate skips: estimator unhealthy"
    theta_fit = np.mean(tail, axis=0)

    # per-block exact validation of the joint AIS fit:
    # (1) block A: the exact streaming NLL's gradient at the AIS fit is
    #     beta * (E_fitA[phi] - muA); a per-block exact streaming fit
    #     stops where it vanishes, so a small gradient IS agreement
    #     with that fit (to first order) — at the AIS noise floor
    fitA = MRF.create([list(C) for C in mA.cliques]).with_theta(
        jnp.asarray(theta_fit[:dA]))
    gA = np.asarray(moments.clique_moments_streaming(fitA)) - muA
    assert np.max(np.abs(gA)) < 0.08
    # (2) block B: a REAL per-block exact fit (elimination backend),
    #     compared marginal-to-marginal with the joint AIS fit
    tB = MRF.create([list(C) for C in mB.cliques])
    optB = optax.adam(0.1)
    rawB = mtrain._from_theta(jnp.full((tB.dimension,), -0.5), True)
    stB = optB.init(rawB)
    stepB = mtrain.make_moment_train_step(
        tB, optB, jnp.asarray(muB, jnp.float32))
    for _ in range(250):
        rawB, stB, _ = stepB(rawB, stB)
    fitB_exact = tB.with_theta(mtrain._to_theta(rawB, True))
    fitB_ais = tB.with_theta(jnp.asarray(theta_fit[dA:]))
    assert np.max(np.abs(
        np.asarray(elimination.clique_marginals(fitB_ais))
        - np.asarray(elimination.clique_marginals(fitB_exact)))) < 0.08


def test_ais_mesh_sharded_chains():
    from qcmrf_tpu.parallel import sharded

    rng = np.random.RandomState(7)
    m = grid_mrf(3, 3)
    m = m.with_theta(jnp.asarray(
        -np.abs(rng.randn(m.dimension)).astype(np.float32) * 0.4))
    exact = float(m.log_partition())
    mesh = sharded.make_mesh(8)
    lnz, diag = ais.ais_log_partition(
        jax.random.PRNGKey(0), m, num_chains=256, num_temps=96,
        return_diagnostics=True, mesh=mesh)
    assert abs(float(lnz) - exact) < max(4 * float(diag["stderr"]), 0.03)
    assert diag["log_weights"].shape == (256,)
    # deterministic: same key, same mesh -> same estimate
    lnz2 = ais.ais_log_partition(
        jax.random.PRNGKey(0), m, num_chains=256, num_temps=96,
        mesh=mesh)
    assert float(lnz2) == float(lnz)
    # marginals ride the same sharded run
    mu = np.asarray(ais.ais_clique_marginals(
        jax.random.PRNGKey(0), m, num_chains=256, num_temps=96,
        mesh=mesh))
    ex_mu = np.asarray(elimination.clique_marginals(m))
    assert np.allclose(mu.reshape(-1, 4).sum(1), 1.0, atol=1e-5)
    assert np.max(np.abs(mu - ex_mu)) < 0.12

    with pytest.raises(ValueError):
        ais.ais_log_partition(jax.random.PRNGKey(0), m,
                              num_chains=100, mesh=mesh)


def test_infer_cli_ais_route(tmp_path):
    # small model: AIS answer agrees with the exact backend
    rng = np.random.RandomState(4)
    cliques = [[i, i + 1] for i in range(5)]
    probe = MRF.create(cliques)
    theta = (-np.abs(rng.randn(probe.dimension)) * 0.3).tolist()
    path = tmp_path / "m.json"
    path.write_text(json.dumps({"cliques": cliques, "theta": theta}))
    exact = infer_cli.main(["--model", str(path), "--query", "lnz"])
    r = infer_cli.main(["--model", str(path), "--query", "lnz",
                        "--method", "ais",
                        "--ais-chains", "128", "--ais-temps", "64"])
    assert r["backend"] == "ais"
    tol = max(4 * r["ais"]["stderr"], 0.05)
    assert abs(r["lnz"] - exact["lnz"]) < tol
    assert r["ais"]["ess"] > 16

    # evidence composes through reduce_evidence
    re_ = infer_cli.main(["--model", str(path), "--query", "lnz",
                          "--evidence", "0=1", "--method", "ais",
                          "--ais-chains", "128", "--ais-temps", "64"])
    ex_ = infer_cli.main(["--model", str(path), "--query", "lnz",
                          "--evidence", "0=1"])
    assert abs(re_["log_mass"] - ex_["log_mass"]) < max(
        4 * re_["ais"]["stderr"], 0.05)

    # every variable observed: the clamped constant, zero stderr
    ev_all = ",".join(f"{v}=1" for v in range(6))
    fa = infer_cli.main(["--model", str(path), "--query", "lnz",
                         "--evidence", ev_all, "--method", "ais"])
    fe = infer_cli.main(["--model", str(path), "--query", "lnz",
                         "--evidence", ev_all])
    assert fa["log_mass"] == pytest.approx(fe["log_mass"], abs=1e-5)
    assert fa["ais"]["stderr"] == 0.0


def test_infer_cli_ais_marginals(tmp_path):
    rng = np.random.RandomState(6)
    cliques = [[i, i + 1] for i in range(5)]
    probe = MRF.create(cliques)
    theta = (-np.abs(rng.randn(probe.dimension)) * 0.3).tolist()
    path = tmp_path / "m.json"
    path.write_text(json.dumps({"cliques": cliques, "theta": theta}))
    # observe a full clique (vars 0 and 1) so the exact marginals carry
    # a one-hot block: the bit-exact re-embedding pin below needs both
    # exact zeros AND exact ones to have teeth
    ex = infer_cli.main(["--model", str(path), "--query", "marginals",
                         "--evidence", "0=1,1=0"])
    r = infer_cli.main(["--model", str(path), "--query", "marginals",
                        "--evidence", "0=1,1=0", "--method", "ais",
                        "--ais-chains", "512", "--ais-temps", "64"])
    assert r["backend"] == "ais"
    a, e = np.asarray(r["marginals"]), np.asarray(ex["marginals"])
    assert np.max(np.abs(a - e)) < 0.08
    # evidence re-embedding preserves the exact zeros/one-hots
    # BIT-EXACTLY (not merely within tolerance): entries the exact
    # route clamps to 0 or 1 must be clamped in the AIS result too
    assert np.any(e == 0) and np.any(e == 1)  # the pin has teeth
    assert np.all(a[e == 0] == 0)
    assert np.all(a[e == 1] == 1)


@pytest.mark.slow  # same K27 compile as test_ais_past_both_exact_caps
def test_infer_cli_ais_past_cap(tmp_path):
    # the refusal regime: exact lnz raises, --method ais serves it
    m = _wide_past_cap_model(0.0)
    path = tmp_path / "wide.json"
    path.write_text(json.dumps({
        "cliques": [list(C) for C in m.cliques],
        "theta": np.zeros(m.dimension).tolist()}))
    with pytest.raises(SystemExit):
        infer_cli.main(["--model", str(path), "--query", "lnz"])
    r = infer_cli.main(["--model", str(path), "--query", "lnz",
                        "--method", "ais",
                        "--ais-chains", "8", "--ais-temps", "4"])
    # theta = 0: every weight is exactly 0, lnZ = 48 ln 2 bit-exactly
    assert r["lnz"] == pytest.approx(48 * np.log(2.0), abs=1e-4)


def test_ais_event_prob_matches_exact():
    from qcmrf_tpu.models import elimination as ve

    rng = np.random.RandomState(8)
    cliques = [[i, i + 1] for i in range(5)] + [[0, 3]]
    probe = MRF.create(cliques)
    m = probe.with_theta(jnp.asarray(
        -np.abs(rng.randn(probe.dimension)).astype(np.float32) * 0.4))
    p, diag = ais.ais_event_prob(
        jax.random.PRNGKey(0), m, 2, 1, num_chains=512, num_temps=64,
        return_diagnostics=True)
    exact = float(ve.conditional_prob(m, 2, 1, {}))
    assert float(diag["ess"]) > 51.2
    assert abs(float(p) - exact) < 0.05


def test_infer_cli_ais_prob(tmp_path):
    from qcmrf_tpu.models import elimination as ve

    rng = np.random.RandomState(9)
    cliques = [[i, i + 1] for i in range(5)]
    probe = MRF.create(cliques)
    theta = (-np.abs(rng.randn(probe.dimension)) * 0.3)
    path = tmp_path / "m.json"
    path.write_text(json.dumps(
        {"cliques": cliques, "theta": theta.tolist()}))
    m = MRF.create(cliques, theta=theta)

    r = infer_cli.main(["--model", str(path), "--query", "prob",
                        "--of", "3=1", "--evidence", "0=1",
                        "--method", "ais", "--ais-chains", "512",
                        "--ais-temps", "64"])
    assert r["backend"] == "ais" and r["ais"]["ess"] > 51.2
    exact = float(ve.conditional_prob(m, 3, 1, {0: 1}))
    assert abs(r["prob"] - exact) < 0.05

    # a queried variable that IS observed answers exactly, no sampling
    r = infer_cli.main(["--model", str(path), "--query", "prob",
                        "--of", "0=1", "--evidence", "0=1",
                        "--method", "ais"])
    assert r["prob"] == 1.0 and r["backend"] == "ais"
