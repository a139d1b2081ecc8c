"""MRF core: layout, potentials, exact inference, samplers."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qcmrf_tpu.models.mrf import MRF, chain_mrf, grid_mrf
from qcmrf_tpu.models import sample as msample


def brute_logpot(cliques, theta, x, n):
    """Reference semantics: clique-major theta, y binary-counting with
    y[0] slowest, variable 0 = MSB of state id."""
    i = 0
    total = 0.0
    for C in cliques:
        for y in itertools.product([0, 1], repeat=len(C)):
            match = all(((x >> (n - 1 - v)) & 1) == y[k] for k, v in enumerate(C))
            if match:
                total += theta[i]
            i += 1
    return total


GRAPHS = [
    [[0]],
    [[0, 1]],
    [[0, 1], [1, 2], [2, 3]],
    [[0, 1, 2], [2, 3, 4]],
    [[0, 1, 2, 3]],
]


@pytest.mark.parametrize("cliques", GRAPHS)
def test_log_potential_matches_bruteforce(cliques):
    rng = np.random.RandomState(7)
    mrf = MRF.create(cliques)
    theta = -np.abs(rng.randn(mrf.dimension))
    mrf = mrf.with_theta(theta)
    n = mrf.n
    xs = np.arange(2 ** n)
    got = np.asarray(mrf.log_potential(jnp.asarray(xs, jnp.int32)))
    want = np.array([brute_logpot(cliques, theta, int(x), n) for x in xs])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_structure_properties():
    mrf = MRF.create([[0, 1], [1, 2], [2, 3]])
    assert mrf.n == 4
    assert mrf.num_vertices == 4
    assert mrf.num_cliques == 3
    assert mrf.dimension == 12
    assert mrf.max_clique == 2
    assert mrf.theta_offsets == (0, 4, 8)


def test_invalid_cliques_rejected():
    with pytest.raises(ValueError):
        MRF.create("nope")
    with pytest.raises(ValueError):
        MRF.create([0, 1])
    with pytest.raises(ValueError):
        MRF.create([[0, 1]], theta=[1.0, 2.0, 3.0])  # wrong dim


def test_partition_and_gibbs():
    rng = np.random.RandomState(3)
    mrf = MRF.create([[0, 1], [1, 2]], theta=-np.abs(rng.randn(8)))
    lp = np.asarray(mrf.all_log_potentials())
    lnZ = float(mrf.log_partition())
    assert np.isclose(lnZ, np.log(np.exp(lp).sum()), rtol=1e-5)
    p = np.asarray(mrf.gibbs_probs())
    np.testing.assert_allclose(p, np.exp(lp - lnZ), rtol=1e-5)
    assert np.isclose(p.sum(), 1.0, atol=1e-6)
    # success rate = Z / 2^n
    assert np.isclose(
        float(mrf.success_rate()), np.exp(lnZ) / 2 ** mrf.n, rtol=1e-5
    )


def test_phi_one_hot():
    mrf = MRF.create([[0, 1], [1, 2]], theta=np.zeros(8))
    phi = np.asarray(mrf.phi(jnp.asarray([5], jnp.int32)))[0]  # x=101
    # x=5 = b101: v0=1, v1=0, v2=1 -> clique (0,1) state y=(1,0)->idx 2;
    # clique (1,2) state y=(0,1)->idx 1 -> offset 4+1=5
    want = np.zeros(8)
    want[2] = 1
    want[5] = 1
    np.testing.assert_array_equal(phi, want)
    # log_potential == theta . phi for random theta
    rng = np.random.RandomState(0)
    th = -np.abs(rng.randn(8))
    m2 = mrf.with_theta(th)
    assert np.isclose(
        float(m2.log_potential(jnp.int32(5))), float(th @ want), rtol=1e-6
    )


def test_beta_scaling():
    rng = np.random.RandomState(1)
    th = -np.abs(rng.randn(8))
    m1 = MRF.create([[0, 1], [1, 2]], theta=th, beta=1.0)
    m2 = MRF.create([[0, 1], [1, 2]], theta=th, beta=2.0)
    lp = np.asarray(m1.all_log_potentials())
    p2 = np.asarray(m2.gibbs_probs())
    want = np.exp(2 * lp) / np.exp(2 * lp).sum()
    np.testing.assert_allclose(p2, want, rtol=1e-5)


def test_grid_and_chain_builders():
    g = grid_mrf(3, 3)
    assert g.n == 9
    assert g.num_cliques == 12  # 3*2 horizontal + 2*3 vertical
    c = chain_mrf(5)
    assert c.n == 5 and c.num_cliques == 4


def test_sample_exact_distribution():
    rng = np.random.RandomState(5)
    mrf = MRF.create([[0, 1]], theta=-np.abs(rng.randn(4)))
    key = jax.random.PRNGKey(0)
    s = np.asarray(msample.sample_exact(key, mrf, 40000))
    emp = np.bincount(s, minlength=4) / len(s)
    p = np.asarray(mrf.gibbs_probs())
    np.testing.assert_allclose(emp, p, atol=0.01)


def test_sample_exact_blocked_two_stage(monkeypatch):
    """Past the Gumbel-matrix budget sample_exact splits into the exact
    two-stage (block, within-block) categorical: same distribution, and
    the gate actually prevents the num_samples x 2^n broadcast (n=24 at
    8000 draws would be a 0.5 TB matrix on the one-stage path)."""
    monkeypatch.setattr(msample, "_CATEGORICAL_BUDGET", 1 << 10)
    rng = np.random.RandomState(7)
    mrf = MRF.create([[0, 1], [1, 2]], theta=-np.abs(rng.randn(8)))
    # 8 states x 40001 samples >> patched budget -> blocked path
    # (odd count also forces a fresh jit trace under the patch)
    s = np.asarray(msample.sample_exact(jax.random.PRNGKey(2), mrf, 40001))
    emp = np.bincount(s, minlength=8) / len(s)
    p = np.asarray(mrf.gibbs_probs())
    np.testing.assert_allclose(emp, p, atol=0.01)


def test_sample_gibbs_distribution():
    rng = np.random.RandomState(6)
    mrf = MRF.create([[0, 1], [1, 2]], theta=-np.abs(rng.randn(8)))
    key = jax.random.PRNGKey(1)
    s = np.asarray(msample.sample_gibbs(key, mrf, 6000, thin=2, burn=50))
    emp = np.bincount(s, minlength=8) / len(s)
    p = np.asarray(mrf.gibbs_probs())
    np.testing.assert_allclose(emp, p, atol=0.03)


def test_sample_pam_map_quality():
    # PAM with Gumbel perturbation concentrates near high-probability states
    rng = np.random.RandomState(8)
    mrf = MRF.create([[0, 1], [1, 2]], theta=-np.abs(rng.randn(8)) * 2)
    key = jax.random.PRNGKey(2)
    s = np.asarray(msample.sample_pam(key, mrf, 4000))
    p = np.asarray(mrf.gibbs_probs())
    # the exact MAP state should be the PAM mode
    assert np.argmax(np.bincount(s, minlength=8)) == np.argmax(p)


def test_map_state():
    mrf = MRF.create([[0, 1]], theta=np.array([-0.1, -5.0, -5.0, -5.0]))
    assert int(msample.map_state(mrf)) == 0


def test_sample_pam_streaming_matches_table():
    """Streaming PAM (per-sample MAP by the block-split argmax kernel,
    arbitrary structure past table widths) uses the SAME perturbation
    semantics as the table sampler, so with the same key the samples
    are bit-identical where both apply — at a kernel-eligible width and
    through the small-n fallback."""
    rng = np.random.RandomState(11)
    cl = [[i, i + 1] for i in range(13)] + [[0, 6], [3, 10]]
    probe = MRF.create(cl)
    mrf = MRF.create(
        cl, theta=-np.abs(rng.randn(probe.dimension)) * 0.6, beta=1.3)
    key = jax.random.PRNGKey(7)
    ids = np.asarray(msample.sample_pam(key, mrf, 6), np.int64)
    ref = (ids[:, None] >> (mrf.n - 1 - np.arange(mrf.n))) & 1
    got = np.asarray(msample.sample_pam_streaming(key, mrf, 6))
    np.testing.assert_array_equal(got, ref)

    small = MRF.create([[0, 1], [1, 2]], theta=-np.abs(rng.randn(8)))
    ids_s = np.asarray(msample.sample_pam(key, small, 12), np.int64)
    ref_s = (ids_s[:, None] >> (small.n - 1 - np.arange(small.n))) & 1
    np.testing.assert_array_equal(
        np.asarray(msample.sample_pam_streaming(key, small, 12)), ref_s)


def test_map_state_clamped_matches_masked_argmax():
    """Evidence-constrained MAP (clique-table reduction + streaming
    argmax + bit re-embed) vs brute-force masked argmax, plus the
    all-evidence and empty-evidence corners."""
    rng = np.random.RandomState(5)
    cl = [[i, i + 1] for i in range(7)] + [[0, 3, 6]]
    probe = MRF.create(cl)
    mrf = MRF.create(cl, theta=-np.abs(rng.randn(probe.dimension)),
                     beta=1.3)
    n = mrf.n
    lps = np.asarray(mrf.beta * mrf.all_log_potentials(), np.float64)
    ids = np.arange(1 << n)

    ev = {1: 1, 4: 0}
    mask = (((ids >> (n - 2)) & 1) == 1) & (((ids >> (n - 5)) & 1) == 0)
    want = int(np.flatnonzero(mask)[np.argmax(lps[mask])])
    got_id, got_val = msample.map_state_clamped(mrf, ev)
    assert got_id == want
    assert np.isclose(got_val, lps[want], rtol=1e-5)

    full = {v: v % 2 for v in range(n)}
    xid = 0
    for v in range(n):
        xid = (xid << 1) | full[v]
    fid, fval = msample.map_state_clamped(mrf, full)
    assert fid == xid and np.isclose(fval, lps[xid], rtol=1e-5)

    eid, _ = msample.map_state_clamped(mrf, {})
    assert eid == int(np.argmax(lps))


def test_sample_conditional_matches_true_conditional():
    """Conditional samples clamp the evidence columns exactly, and the
    free-variable empirical marginals match elimination's conditionals
    for every method; PAM re-embeds the reduced model's streaming
    samples bit-identically under the same key."""
    from qcmrf_tpu.models import elimination as ve
    from qcmrf_tpu.models import moments

    rng = np.random.RandomState(5)
    cl = [[i, i + 1] for i in range(7)] + [[0, 3, 6]]
    probe = MRF.create(cl)
    mrf = MRF.create(cl, theta=-np.abs(rng.randn(probe.dimension)),
                     beta=1.3)
    n, ev = mrf.n, {1: 1, 4: 0}

    bits = np.asarray(msample.sample_conditional(
        jax.random.PRNGKey(0), mrf, 20_000, ev))
    assert (bits[:, 1] == 1).all() and (bits[:, 4] == 0).all()
    for v in (0, 3, 7):
        true = float(ve.conditional_prob(mrf, v, 1, ev))
        assert abs(bits[:, v].mean() - true) < 0.015

    bits_g = np.asarray(msample.sample_conditional(
        jax.random.PRNGKey(1), mrf, 4_000, ev, method="gibbs"))
    assert (bits_g[:, 1] == 1).all() and (bits_g[:, 4] == 0).all()
    true0 = float(ve.conditional_prob(mrf, 0, 1, ev))
    assert abs(bits_g[:, 0].mean() - true0) < 0.05

    red, _ = moments.reduce_evidence(mrf, ev)
    rb = np.asarray(msample.sample_pam_streaming(
        jax.random.PRNGKey(2), red, 8))
    pb = np.asarray(msample.sample_conditional(
        jax.random.PRNGKey(2), mrf, 8, ev, method="pam"))
    free = [v for v in range(n) if v not in ev]
    np.testing.assert_array_equal(pb[:, free], rb)
    assert (pb[:, 1] == 1).all() and (pb[:, 4] == 0).all()

    all_ev = {v: v % 2 for v in range(n)}
    ab = np.asarray(msample.sample_conditional(
        jax.random.PRNGKey(3), mrf, 3, all_ev))
    np.testing.assert_array_equal(
        ab, np.tile([v % 2 for v in range(n)], (3, 1)))

    with pytest.raises(ValueError, match="unknown method"):
        msample.sample_conditional(
            jax.random.PRNGKey(0), mrf, 4, ev, method="bogus")


def test_conditional_queries_isolated_variable():
    """An isolated variable (in no clique) is an independent uniform
    bit: conditional samples must draw it ~Bernoulli(1/2) for every
    method (PAM's low-order perturbation never breaks its tie — the
    uniform overlay handles it exactly), and the clamped MAP must place
    the reduced bits on the right variables around it."""
    from qcmrf_tpu.models import moments

    mrf = MRF.create([[0], [2]],
                     theta=np.asarray([-0.4, 0.0, -0.2, 0.0]), beta=1.0,
                     n=3)
    for method in ("exact", "gibbs", "pam"):
        bits = np.asarray(msample.sample_conditional(
            jax.random.PRNGKey(3), mrf, 600, {2: 1}, method=method))
        assert (bits[:, 2] == 1).all()
        assert 0.4 < bits[:, 1].mean() < 0.6, method
        # the old inferred-n bug broadcast one reduced column into
        # both free columns, making them identical
        assert (bits[:, 0] != bits[:, 1]).any(), method

    # every clique determined, the isolated variable still uniform
    pb = np.asarray(msample.sample_conditional(
        jax.random.PRNGKey(4), mrf, 600, {0: 0, 2: 1}, method="pam"))
    assert (pb[:, 0] == 0).all() and (pb[:, 2] == 1).all()
    assert 0.4 < pb[:, 1].mean() < 0.6

    # clamped MAP: theta prefers x0=1, x2=1; evidence pins x2=0; the
    # isolated variable ties (either bit is a valid argmax)
    sid, val = msample.map_state_clamped(mrf, {2: 0})
    b = [(sid >> (2 - v)) & 1 for v in range(3)]
    assert b[0] == 1 and b[2] == 0
    assert np.isclose(val, 0.0 + -0.2, atol=1e-6)


def test_nll_gradient_is_moment_difference():
    rng = np.random.RandomState(9)
    mrf = MRF.create([[0, 1], [1, 2]], theta=-np.abs(rng.randn(8)))
    data = jnp.asarray([0, 1, 5, 7], jnp.int32)
    g = jax.grad(lambda th: mrf.with_theta(th).nll(data))(mrf.theta)
    p = np.asarray(mrf.gibbs_probs())
    xs = jnp.arange(8, dtype=jnp.int32)
    phis = np.asarray(mrf.phi(xs))
    model_moment = p @ phis
    data_moment = np.asarray(mrf.phi(data)).mean(0)
    np.testing.assert_allclose(
        np.asarray(g), model_moment - data_moment, atol=1e-5
    )


def test_sample_gibbs_bits_distribution():
    """The bit-array Gibbs chain (local site updates, no state-id
    width cap) samples the same Gibbs distribution as enumeration."""
    rng = np.random.RandomState(13)
    cl = [[0, 1], [1, 2, 3], [3, 4], [2, 0]]
    probe = MRF.create(cl)
    mrf = MRF.create(cl, theta=-np.abs(rng.randn(probe.dimension)),
                     beta=1.2)
    logits = np.asarray(mrf.beta * mrf.all_log_potentials(), np.float64)
    p = np.exp(logits - logits.max())
    p /= p.sum()
    bits = np.asarray(msample.sample_gibbs_bits(
        jax.random.PRNGKey(0), mrf, 30_000, thin=5, burn=50))
    ids = (bits << (mrf.n - 1 - np.arange(mrf.n))).sum(axis=1)
    emp = np.bincount(ids, minlength=1 << mrf.n) / len(ids)
    assert 0.5 * np.abs(emp - p).sum() < 0.03


def test_conditional_gibbs_serves_wide_and_large():
    """In the wide-AND-large regime where both exact backends refuse
    (free variables past the table/sweep caps AND induced width past
    the elimination caps), the bit-array Gibbs chain still serves
    conditional draws with the evidence clamped."""
    from qcmrf_tpu.models import moments

    cliques = [list(range(18))] + [[i, i + 1] for i in range(17, 49)]
    probe = MRF.create(cliques)
    mrf = MRF.create(cliques, theta=-0.01 * np.ones((probe.dimension,)))
    assert mrf.n == 50 and mrf.n > moments._MAX_N
    bits = np.asarray(msample.sample_conditional(
        jax.random.PRNGKey(1), mrf, 5, {0: 1, 30: 0}, method="gibbs"))
    assert bits.shape == (5, 50)
    assert (bits[:, 0] == 1).all() and (bits[:, 30] == 0).all()
    assert set(np.unique(bits)) <= {0, 1}


def test_conditional_exact_large_n_routes_to_elimination():
    """method='exact' past the table cap draws IID exact samples via
    elimination's ancestral sampler: evidence columns clamp and the
    free-variable empirical marginals match conditional_prob at n=30
    (a 2^30 logits table would OOM the old table-only route)."""
    from qcmrf_tpu.models import elimination as ve
    from qcmrf_tpu.models import sample as S

    n = 30
    assert n > S._EXACT_TABLE_N
    rng = np.random.RandomState(11)
    cl = [[i, i + 1] for i in range(n - 1)]
    probe = MRF.create(cl)
    mrf = MRF.create(cl, theta=-np.abs(rng.randn(probe.dimension)))
    ev = {0: 1, 13: 0, 29: 1}
    bits = np.asarray(msample.sample_conditional(
        jax.random.PRNGKey(5), mrf, 30_000, ev, method="exact"))
    assert (bits[:, 0] == 1).all() and (bits[:, 13] == 0).all() \
        and (bits[:, 29] == 1).all()
    for v in (1, 7, 14, 28):
        true = float(ve.conditional_prob(mrf, v, 1, ev))
        assert abs(bits[:, v].mean() - true) < 0.02, (v, true)


def test_conditional_exact_wide_fallbacks(monkeypatch):
    """A wide structure past the cheap-table cap falls back to the
    enumerated table while it fits, and raises with the limits spelled
    out once free variables exceed the hard table cap too."""
    from qcmrf_tpu.models import sample as S
    from qcmrf_tpu.models import train as mtrain

    rng = np.random.RandomState(12)
    cl = [[i, i + 1] for i in range(21)]  # n=22: past 20, under 26
    probe = MRF.create(cl)
    mrf = MRF.create(cl, theta=-np.abs(rng.randn(probe.dimension)))
    monkeypatch.setattr(mtrain, "_ELIM_WIDTH_CAP", 1)  # force "wide"
    bits = np.asarray(msample.sample_conditional(
        jax.random.PRNGKey(0), mrf, 8, {}, method="exact"))
    assert bits.shape == (8, 22)

    cl = [[i, i + 1] for i in range(27)]  # n=28 > hard table cap 26
    probe = MRF.create(cl)
    mrf = MRF.create(cl, theta=-np.abs(rng.randn(probe.dimension)))
    with pytest.raises(ValueError, match="ancestral"):
        msample.sample_conditional(
            jax.random.PRNGKey(0), mrf, 2, {}, method="exact")


def test_conditional_pam_wide_past_sweep_cap_raises():
    """A reduced model that is BOTH past the streaming sweep's n cap and
    wider than the elimination-PAM width cap has no exact PAM backend:
    it must refuse with the limits spelled out, not OOM in the vmapped
    traceback tables (round-4 review finding)."""
    from qcmrf_tpu.models import moments

    # n=50 > moments._MAX_N=47; the 18-clique makes induced width 18 > 16
    cliques = [list(range(18))] + [[i, i + 1] for i in range(17, 49)]
    probe = MRF.create(cliques)
    mrf = MRF.create(cliques,
                     theta=-0.01 * np.ones((probe.dimension,)))
    assert mrf.n == 50 and mrf.n > moments._MAX_N
    with pytest.raises(ValueError, match="induced width"):
        msample.sample_conditional(
            jax.random.PRNGKey(0), mrf, 2, {}, method="pam")
    # enough evidence to fall under the sweep cap restores the
    # streaming route (no raise); clamping inside the big clique also
    # shrinks the width below the elimination cap
    ev = {v: 0 for v in range(4)}
    bits = np.asarray(msample.sample_conditional(
        jax.random.PRNGKey(0), mrf, 2, ev, method="pam"))
    assert bits.shape == (2, 50) and (bits[:, :4] == 0).all()
