"""Lowering pass: exact statevector equivalence in the hardware basis."""

import numpy as np
import pytest

from qcmrf_tpu.circuits import lower as L
from qcmrf_tpu.circuits.compiler import compile_qcmrf
from qcmrf_tpu.circuits.ir import Circuit
from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.sim import dense


def assert_states_equal(a, b, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def make_mrf(cliques, seed=0, scale=0.5):
    rng = np.random.RandomState(seed)
    probe = MRF.create(cliques)
    return MRF.create(cliques, theta=-np.abs(rng.randn(probe.dimension)) * scale)


def test_h_identity():
    c = Circuit(1)
    c.h(0)
    assert_states_equal(
        dense.run_statevector(L.lower(c)), dense.run_statevector(c)
    )


def test_sxdg_identity():
    c = Circuit(1)
    c.h(0).sxdg(0)
    assert_states_equal(
        dense.run_statevector(L.lower(c)), dense.run_statevector(c)
    )


def test_cp_identity():
    c = Circuit(2)
    c.h(0).h(1).cp(0.7, 0, 1)
    assert_states_equal(
        dense.run_statevector(L.lower(c)), dense.run_statevector(c)
    )


@pytest.mark.parametrize("m", [2, 3, 4, 5])
def test_mcp_synthesis(m):
    """MCP(theta) should phase exactly the all-ones state."""
    theta = 0.9
    c = Circuit(m)
    for q in range(m):
        c.h(q)
    L._emit_mcp(c, theta, list(range(m)))
    got = np.asarray(dense.run_statevector(c))
    want = np.full(1 << m, 1 / np.sqrt(1 << m), dtype=complex)
    want[-1] *= np.exp(1j * theta)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mcx_synthesis():
    c = Circuit(3)
    c.x(0).x(1)
    L._emit_mcx(c, [0, 1], 2)
    probs = np.abs(np.asarray(dense.run_statevector(c))) ** 2
    assert np.isclose(probs[0b111], 1.0, atol=1e-6)
    # control off -> no flip
    c2 = Circuit(3)
    c2.x(0)
    L._emit_mcx(c2, [0, 1], 2)
    probs2 = np.abs(np.asarray(dense.run_statevector(c2))) ** 2
    assert np.isclose(probs2[0b001], 1.0, atol=1e-6)


GRAPHS = [
    [[0]],
    [[0, 1]],
    [[0, 1], [1, 2], [2, 3]],
    [[0, 1, 2]],
    [[0, 1, 2, 3]],
]


@pytest.mark.parametrize("cliques", GRAPHS)
@pytest.mark.parametrize("style", ["fused", "literal"])
def test_lowered_qcmrf_exact_state(cliques, style):
    mrf = make_mrf(cliques, seed=7)
    circ = compile_qcmrf(mrf, with_measurements=False)
    lowered = L.lower(circ, style=style)
    names = {g.name for g in lowered.gates}
    assert names <= set(L.BASIS) | {"measure", "barrier"}
    assert_states_equal(
        dense.run_statevector(lowered), dense.run_statevector(circ)
    )


def test_lowered_measured_distribution():
    mrf = make_mrf([[0, 1], [1, 2]], seed=4)
    circ = compile_qcmrf(mrf)
    lowered = L.lower(circ, style="literal")
    p1 = np.asarray(dense.simulate_probs(circ))
    p2 = np.asarray(dense.simulate_probs(lowered))
    np.testing.assert_allclose(p2, p1, atol=5e-6)


def test_basis_gate_counts():
    mrf = make_mrf([[0, 1]], seed=1)
    circ = compile_qcmrf(mrf)
    counts = L.basis_gate_counts(circ)
    assert set(counts) <= set(L.BASIS)
    assert counts["cx"] > 0 and counts["rz"] > 0
    # literal style routes through the workspace qubit: strictly more gates
    lit = L.basis_gate_counts(circ, style="literal")
    assert lit["cx"] > counts["cx"]


def test_literal_workspace_no_collision_when_var0_unused():
    """Variable 0 in no clique: its reflected qubit (n-1) sits ABOVE the
    pattern range, so 'max pattern qubit + 1' would collide with it; the
    idle-qubit default (and QCMRF.lowered's explicit workspace) must pick
    the true workspace qubit n instead."""
    import numpy as np

    from qcmrf_tpu.circuits.compiler import QCMRF, compile_qcmrf
    from qcmrf_tpu.models.mrf import MRF
    from qcmrf_tpu.sim import dense

    rng = np.random.RandomState(6)
    mrf = MRF.create([[1, 2]], theta=-np.abs(rng.randn(4)) * 0.5)
    assert mrf.n == 3  # variable 0 exists but appears in no clique
    circ = compile_qcmrf(mrf, with_measurements=False)
    low = L.lower(circ, style="literal")
    np.testing.assert_allclose(
        np.asarray(dense.run_statevector(low)),
        np.asarray(dense.run_statevector(circ)), atol=1e-6)
    # facade path passes workspace explicitly
    q = QCMRF.build([[1, 2]], theta=np.asarray(mrf.theta),
                    with_measurements=False)
    low2 = q.lowered(style="literal")
    np.testing.assert_allclose(
        np.asarray(dense.run_statevector(low2)),
        np.asarray(dense.run_statevector(circ)), atol=1e-6)


@pytest.mark.parametrize("cliques", [
    [[0, 1]],
    [[0, 1], [1, 2], [2, 3]],
    [[0, 1, 2]],
    [[0, 1, 2, 3]],
])
def test_fused_diagonal_optimization_exact(cliques):
    """optimize=1 merges each clique's flags_phase run into one exact
    diagonal synthesis: statevector-identical (incl. global phase) with
    a large gate reduction (2^|C|-fold per clique block)."""
    from qcmrf_tpu.circuits.compiler import compile_qcmrf
    from qcmrf_tpu.models.mrf import MRF
    from qcmrf_tpu.sim import dense

    rng = np.random.RandomState(8)
    probe = MRF.create(cliques)
    mrf = MRF.create(cliques,
                     theta=-np.abs(rng.randn(probe.dimension)) * 0.4)
    circ = compile_qcmrf(mrf, with_measurements=False)
    base = L.lower(circ)
    opt = L.lower(circ, optimize=1)
    np.testing.assert_allclose(
        np.asarray(dense.run_statevector(opt)),
        np.asarray(dense.run_statevector(circ)), atol=1e-6)

    def count(c):
        return sum(v for k, v in c.count_ops().items()
                   if k not in ("measure", "barrier"))

    m = max(len(C) for C in cliques)
    assert count(opt) * max(2, (1 << m) // 2) <= count(base), (
        count(base), count(opt))
    # still strictly in the hardware basis
    assert set(g.name for g in opt.gates) <= set(L.BASIS) | {
        "measure", "barrier"}


def test_fused_diagonal_single_gate_run():
    """A run of length 1 still lowers exactly (degenerate merge)."""
    from qcmrf_tpu.circuits.ir import Circuit
    from qcmrf_tpu.sim import dense

    c = Circuit(3)
    c.h(0).h(1).h(2)
    c.flags_phase([0, 1], (1, -1), 0.83, control=2)
    opt = L.lower(c, optimize=1)
    np.testing.assert_allclose(
        np.asarray(dense.run_statevector(opt)),
        np.asarray(dense.run_statevector(c)), atol=1e-6)
