"""Pauli algebra: sufficient statistics and Hamiltonian diagonals."""

import itertools

import numpy as np

from qcmrf_tpu.models import pauli
from qcmrf_tpu.models.mrf import MRF


def test_projector_diagonal():
    # |0><0| on variable 0 of 2 -> diag over states (v0 MSB): 1,1,0,0
    p = pauli.projector(2, 0, 0)
    np.testing.assert_allclose(np.asarray(p.diagonal()), [1, 1, 0, 0])
    p1 = pauli.projector(2, 1, 1)
    np.testing.assert_allclose(np.asarray(p1.diagonal()), [0, 1, 0, 1])


def test_sufficient_statistic_is_indicator():
    n = 3
    C = [0, 2]
    for y in itertools.product([0, 1], repeat=2):
        op = pauli.sufficient_statistic(n, C, y)
        diag = np.asarray(op.diagonal())
        for x in range(2 ** n):
            match = all(
                ((x >> (n - 1 - v)) & 1) == y[k] for k, v in enumerate(C)
            )
            assert diag[x] == (1.0 if match else 0.0)


def test_hamiltonian_diagonal_is_minus_logpot():
    rng = np.random.RandomState(4)
    cliques = [[0, 1], [1, 2]]
    mrf = MRF.create(cliques)
    theta = -np.abs(rng.randn(mrf.dimension))
    mrf = mrf.with_theta(theta)
    H = pauli.hamiltonian(mrf.n, cliques, theta)
    diag = np.asarray(H.diagonal())
    lp = np.asarray(mrf.all_log_potentials())
    np.testing.assert_allclose(diag, -lp, rtol=1e-6, atol=1e-8)


def test_algebra_ops():
    n = 2
    I = pauli.identity(n)
    Z0 = pauli.z_on(n, 0)
    # Z0 @ Z0 = I
    assert (Z0 @ Z0).as_dict() == I.as_dict()
    s = (I + Z0) * 0.5
    np.testing.assert_allclose(np.asarray(s.diagonal()), [1, 1, 0, 0])
    assert s.adjoint() is s


def test_conjugate_blocks():
    A = pauli.z_on(2, 1)
    B = pauli.conjugate_blocks(A)
    assert B.n == 3
    # I (x) Z1: diagonal repeats over the new MSB qubit
    np.testing.assert_allclose(
        np.asarray(B.diagonal()), [1, -1, 1, -1, 1, -1, 1, -1]
    )
