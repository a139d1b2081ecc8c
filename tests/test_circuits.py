"""Circuit compiler + dense simulator + analytic fast path agreement."""

import numpy as np
import pytest

import jax.numpy as jnp

from qcmrf_tpu.circuits import params as cparams
from qcmrf_tpu.circuits.compiler import QCMRF, compile_qcmrf
from qcmrf_tpu.circuits.ir import Circuit
from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.sim import analytic, dense


GRAPHS = [
    [[0]],
    [[0, 1]],
    [[0, 1], [1, 2], [2, 3]],
    [[0, 1, 2]],
    [[0, 1, 2], [2, 3, 4]],
    [[0, 1, 2, 3]],
]


def make_mrf(cliques, seed=0, scale=0.5):
    rng = np.random.RandomState(seed)
    probe = MRF.create(cliques)
    theta = -np.abs(rng.randn(probe.dimension)) * scale
    return MRF.create(cliques, theta=theta)


def test_param_maps_roundtrip():
    theta = -np.abs(np.random.RandomState(0).randn(16))
    g = np.asarray(cparams.theta_to_gamma(theta, 1.0))
    back = np.asarray(cparams.gamma_to_theta(g, 1.0))
    np.testing.assert_allclose(back, theta, rtol=1e-5, atol=1e-6)
    # reference formula parity: gamma = arccos(exp(theta/2))/2
    np.testing.assert_allclose(
        g, 0.5 * np.arccos(np.exp(0.5 * theta)), rtol=1e-6
    )


def test_theta_domain_validation():
    with pytest.raises(ValueError):
        cparams.validate_theta_domain(np.array([0.1, -0.5]))


def test_qcmrf_facade_properties():
    q = QCMRF.build([[0, 1], [1, 2]], theta=[-0.1] * 8)
    assert q.dimension == 8
    assert q.num_vertices == 3
    assert q.num_nodes == 3
    assert q.num_cliques == 2
    assert q.max_clique == 2
    assert q.num_qubits == 3 + 2 + 1
    assert q.workspace_qubit == 3
    assert q.ancilla_qubits == [4, 5]
    np.testing.assert_allclose(q.theta, [-0.1] * 8)
    np.testing.assert_allclose(
        q.gamma, 0.5 * np.arccos(np.exp(-0.05 * np.ones(8))), rtol=1e-6
    )


def test_qcmrf_gamma_constructor():
    theta = -np.abs(np.random.RandomState(1).randn(4)) * 0.3
    gamma = np.asarray(cparams.theta_to_gamma(theta))
    q = QCMRF.build([[0, 1]], gamma=gamma)
    np.testing.assert_allclose(q.theta, theta, rtol=1e-4, atol=1e-6)


def test_qcmrf_default_init_in_domain():
    np.random.seed(42)
    q = QCMRF.build([[0, 1]])
    t = np.asarray(q.theta)
    assert np.all(t <= 0) and np.all(t >= -5)


def test_bad_dimension_raises():
    with pytest.raises(ValueError):
        QCMRF.build([[0, 1]], theta=[-0.1] * 3)
    with pytest.raises(ValueError):
        QCMRF.build([[0, 1]], gamma=[0.1] * 3)


@pytest.mark.parametrize("cliques", GRAPHS)
def test_dense_sim_matches_analytic_joint(cliques):
    """Gate-level simulation of the compiled circuit reproduces the
    closed-form joint outcome distribution."""
    mrf = make_mrf(cliques, seed=3)
    circ = compile_qcmrf(mrf)
    probs = np.asarray(dense.simulate_probs(circ))
    want = np.asarray(analytic.joint_outcome_probs(mrf))
    np.testing.assert_allclose(probs, want, atol=1e-5)


@pytest.mark.parametrize("cliques", GRAPHS[:4])
def test_postselected_is_gibbs(cliques):
    """Post-selecting the simulated joint on index < 2**n yields the exact
    Gibbs distribution with success rate Z/2**n (Appendix A items 4-5)."""
    mrf = make_mrf(cliques, seed=11)
    circ = compile_qcmrf(mrf)
    probs = np.asarray(dense.simulate_probs(circ))
    n = mrf.n
    q = probs[: 2 ** n]
    Z = q.sum()
    p = np.asarray(mrf.gibbs_probs())
    np.testing.assert_allclose(q / Z, p, atol=1e-5)
    assert np.isclose(Z, float(mrf.success_rate()), atol=1e-5)


def test_workspace_qubit_stays_zero():
    mrf = make_mrf([[0, 1], [1, 2]], seed=5)
    circ = compile_qcmrf(mrf)
    probs = np.asarray(dense.simulate_probs(circ))
    n = mrf.n
    # any outcome with workspace clbit (bit n) set has zero probability
    idx = np.arange(len(probs))
    assert probs[((idx >> n) & 1) == 1].sum() < 1e-10


def test_gamma_zero_skip_rule():
    """theta = 0 entries produce no flags_phase blocks (QCMRF.py:223)."""
    theta = np.array([0.0, -0.4, 0.0, -0.2])
    mrf = MRF.create([[0, 1]], theta=theta)
    circ = compile_qcmrf(mrf)
    ops = circ.count_ops()
    # 2 nonzero gammas x (forward + inverse) = 4 flags_phase ops
    assert ops["flags_phase"] == 4
    # distribution unchanged vs dense small-value replacement
    probs = np.asarray(dense.simulate_probs(circ))
    want = np.asarray(analytic.joint_outcome_probs(mrf))
    np.testing.assert_allclose(probs, want, atol=1e-5)


def test_circuit_inverse_unitarity():
    mrf = make_mrf([[0, 1]], seed=9)
    circ = compile_qcmrf(mrf, with_measurements=False)
    inv = circ.inverse()
    state = dense.run_statevector(circ)
    state = dense.run_statevector(inv, initial_state=state)
    want = np.zeros(len(np.asarray(state)))
    want[0] = 1.0
    np.testing.assert_allclose(np.abs(np.asarray(state)) ** 2, want, atol=1e-6)


def test_measurement_wiring():
    mrf = make_mrf([[0, 1], [1, 2]], seed=13)
    circ = compile_qcmrf(mrf)
    n, K = 3, 2
    pairs = circ.measured_pairs
    # ancillas measured to clbits n+1+ii, then variables qubit i -> clbit i
    assert (n + 1, n + 1) in pairs and (n + 2, n + 2) in pairs
    for i in range(n):
        assert (i, i) in pairs
    assert len(pairs) == n + K


def test_with_barriers_and_no_measurements():
    mrf = make_mrf([[0, 1]], seed=2)
    c1 = compile_qcmrf(mrf, with_measurements=False, with_barriers=True)
    assert "measure" not in c1.count_ops()
    assert c1.count_ops()["barrier"] >= 1


def test_dense_engine_basic_gates():
    """Spot-check engine gates against hand equations."""
    c = Circuit(2)
    c.h(0).cx(0, 1)  # Bell state (|00> + |11>)/sqrt(2)
    st = np.asarray(dense.run_statevector(c))
    want = np.zeros(4, dtype=complex)
    want[0] = want[3] = 1 / np.sqrt(2)
    np.testing.assert_allclose(st, want, atol=1e-6)

    c2 = Circuit(1)
    c2.sx(0).sx(0)  # SX^2 = X
    st2 = np.asarray(dense.run_statevector(c2))
    np.testing.assert_allclose(np.abs(st2) ** 2, [0, 1], atol=1e-6)

    c3 = Circuit(2)
    c3.h(0).h(1).cp(np.pi / 3, 0, 1)
    st3 = np.asarray(dense.run_statevector(c3))
    assert np.isclose(np.angle(st3[3]) - np.angle(st3[0]), np.pi / 3, atol=1e-6)


def test_operator_helpers_on_facade():
    """Reference API parity: sufficient_statistic / Hamiltonian /
    _conjugate_blocks on the QCMRF object (QCMRF.py:159-197)."""
    theta = [-0.2, -0.4, -0.1, -0.3]
    q = QCMRF.build([[0, 1]], theta=theta)
    ss = q.sufficient_statistic([0, 1], (1, 0))
    diag = np.asarray(ss.diagonal())
    np.testing.assert_array_equal(diag, [0, 0, 1, 0])  # x=10 only
    H = q.Hamiltonian()
    np.testing.assert_allclose(
        np.asarray(H.diagonal()), [0.2, 0.4, 0.1, 0.3], atol=1e-9
    )
    B = q._conjugate_blocks(ss)
    assert B.n == 3


def test_basis_gates_ctor_and_lowered():
    """Reference ctor parity (QCMRF.py:25): basis_gates is stored; the
    lowered() method targets it (only the reference basis is supported)."""
    import pytest

    from qcmrf_tpu.circuits.compiler import QCMRF
    from qcmrf_tpu.circuits.lower import basis_gate_counts

    q = QCMRF.build([[0, 1]], theta=[-0.2] * 4)
    assert tuple(q.basis_gates) == ("cx", "id", "rz", "sx", "x")
    low = q.lowered()
    counts = basis_gate_counts(low)
    assert set(counts) <= {"cx", "id", "rz", "sx", "x", "measure", "barrier"}
    q2 = QCMRF.build([[0, 1]], theta=[-0.2] * 4, basis_gates=["cz", "rx"])
    with pytest.raises(ValueError):
        q2.lowered()


def test_gamma_domain_rejected():
    """gamma outside |gamma| < pi/4 has no MRF equivalent (cos(2g) <= 0
    would make 2*log(cos) NaN/-inf); the facade raises instead of
    silently building an all-NaN circuit. (The reference feeds such gamma
    straight to the phase gates, QCMRF.py:221-228, converting to theta
    only lazily — but every distribution-level API here is MRF-backed.)"""
    with pytest.raises(ValueError, match="gamma"):
        QCMRF.build([[0, 1]], gamma=[0.9] * 4)
    # (float pi/4 itself maps to cos ~ 6e-17 > 0: a huge but finite and
    # valid theta, so only strictly-outside values are rejected)
    # interior gamma still round-trips
    q = QCMRF.build([[0, 1]], gamma=[0.3] * 4)
    np.testing.assert_allclose(np.asarray(q.gamma), 0.3, atol=1e-6)
