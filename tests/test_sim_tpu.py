"""TPU plane engine (interpret mode on CPU) vs the dense complex engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from qcmrf_tpu.circuits.compiler import compile_qcmrf
from qcmrf_tpu.circuits.ir import Circuit
from qcmrf_tpu.circuits.lower import lower
from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.sim import dense
from qcmrf_tpu.sim import tpu as stpu


def to_complex(re, im):
    return np.asarray(re).reshape(-1) + 1j * np.asarray(im).reshape(-1)


def rand_mrf(cliques, seed=0, scale=0.5):
    rng = np.random.RandomState(seed)
    probe = MRF.create(cliques)
    return MRF.create(cliques, theta=-np.abs(rng.randn(probe.dimension)) * scale)


def test_basic_gate_sequence():
    c = Circuit(7)
    c.h(0).h(3).h(6).x(1).sx(2).rz(0.4, 0).cp(0.9, 3, 6).cx(0, 5).sxdg(2)
    got = to_complex(*stpu.run_statevector(c))
    want = np.asarray(dense.run_statevector(c))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cx_all_positions():
    for c_q, t_q in [(0, 6), (6, 0), (3, 4)]:
        c = Circuit(7)
        c.h(c_q).cx(c_q, t_q)
        got = to_complex(*stpu.run_statevector(c))
        want = np.asarray(dense.run_statevector(c))
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("cliques", [
    [[0, 1], [1, 2], [2, 3]],      # width 8
    [[0, 1, 2], [2, 3, 4]],        # width 8
    [[0, 1], [1, 2], [2, 3], [3, 4]],  # width 10
])
def test_qcmrf_circuit_probs(cliques):
    mrf = rand_mrf(cliques, seed=3)
    circ = compile_qcmrf(mrf)
    got = np.asarray(stpu.simulate_probs(circ))
    want = np.asarray(dense.simulate_probs(circ))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lowered_circuit_runs_on_plane_engine():
    """Basis-gate circuits (cx/rz/sx/x) also run on the TPU engine."""
    mrf = rand_mrf([[0, 1], [1, 2], [2, 3]], seed=5)
    circ = lower(compile_qcmrf(mrf), style="fused")
    got = np.asarray(stpu.simulate_probs(circ))
    want = np.asarray(dense.simulate_probs(circ))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_small_circuit_rejected():
    c = Circuit(3)
    c.h(0)
    with pytest.raises(ValueError):
        stpu.run_statevector(c)
