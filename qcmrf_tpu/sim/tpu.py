"""TPU gate-level statevector engine on real/imag float32 planes.

The on-device counterpart of :mod:`qcmrf_tpu.sim.dense` (which uses complex
dtypes the TPU backend does not support): amplitudes live as two
``(2**Q / 128, 128)`` float32 planes and every gate is a Pallas kernel from
:mod:`qcmrf_tpu.ops.kernels` —

* non-diagonal 1q gates: lane-qubit MXU matmul / row-qubit strided pairs
  (``apply_1q``);
* all diagonal gates (rz, cp, flags_phase): one masked-rotation pass;
* cx: X-basis decomposition ``cx = H_t . cp(pi) . H_t`` (keeps the gate
  set closed over the implemented kernels).

Requires ``Q >= 7`` (one lane row); smaller circuits fall back to the
dense engine. Measurements are deferred exactly as in the dense engine.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qcmrf_tpu.circuits.ir import Circuit, Gate
from qcmrf_tpu.ops import kernels as K
from qcmrf_tpu.sim.dense import GATES_1Q


def zero_planes(num_qubits: int) -> Tuple[jax.Array, jax.Array]:
    rows = (1 << num_qubits) // 128
    re = jnp.zeros((rows, 128), jnp.float32).at[0, 0].set(1.0)
    return re, jnp.zeros_like(re)


def _diag_conds_and_angles(g: Gate):
    """(conds, base, masked) for a diagonal gate."""
    if g.name == "rz":
        lam = g.params[0]
        return ((g.qubits[0], 1),), -lam / 2.0, lam
    if g.name == "cp":
        lam = g.params[0]
        c, t = g.qubits
        return ((c, 1), (t, 1)), 0.0, lam
    if g.name == "flags_phase":
        *pattern, ctrl = g.qubits
        conds = [(ctrl, 1)]
        for q, f in zip(pattern, g.flags):
            conds.append((q, (f + 1) // 2))
        return tuple(conds), 0.0, g.params[0]
    raise ValueError(f"not diagonal: {g.name}")


def apply_gate(re, im, g: Gate, num_qubits: int):
    if g.name in ("barrier", "measure", "id"):
        return re, im
    if g.name in ("h", "x", "sx", "sxdg"):
        return K.apply_1q(re, im, GATES_1Q[g.name], g.qubits[0], num_qubits)
    if g.name in ("rz", "cp", "flags_phase"):
        conds, base, masked = _diag_conds_and_angles(g)
        return K.apply_masked_rotation(re, im, conds, base, masked)
    if g.name == "cx":
        c, t = g.qubits
        re, im = K.apply_1q(re, im, GATES_1Q["h"], t, num_qubits)
        re, im = K.apply_masked_rotation(
            re, im, ((c, 1), (t, 1)), 0.0, math.pi
        )
        return K.apply_1q(re, im, GATES_1Q["h"], t, num_qubits)
    raise ValueError(f"unsupported gate {g.name}")


def run_statevector(circuit: Circuit) -> Tuple[jax.Array, jax.Array]:
    """Final statevector planes with measurements deferred."""
    nq = circuit.num_qubits
    if nq < 7:
        raise ValueError(
            "TPU plane engine needs >= 7 qubits; use sim.dense below that"
        )
    re, im = zero_planes(nq)
    for g in circuit.gates:
        re, im = apply_gate(re, im, g, nq)
    if circuit.global_phase:
        c = float(np.cos(circuit.global_phase))
        s = float(np.sin(circuit.global_phase))
        re, im = re * c - im * s, re * s + im * c
    return re, im


def outcome_probs(circuit: Circuit, re, im) -> jax.Array:
    """Joint clbit-value distribution (QCMRF wiring: identity key map)."""
    probs = (re * re + im * im).reshape(-1)
    pairs = circuit.measured_pairs
    # the identity shortcut is only valid when EVERY qubit is measured to
    # its own clbit — with unmeasured qubits in superposition, mass must
    # be marginalized onto keys with those clbits zero (dense semantics)
    if not pairs or (
        len(pairs) == circuit.num_qubits
        and all(q == c for q, c in pairs)
    ):
        return probs
    idx = jnp.arange(probs.shape[0], dtype=jnp.int32)
    keys = jnp.zeros_like(idx)
    for q, c in pairs:
        keys = keys | (((idx >> q) & 1) << c)
    out = jnp.zeros((1 << circuit.num_clbits,), dtype=probs.dtype)
    return out.at[keys].add(probs)


def simulate_probs(circuit: Circuit) -> jax.Array:
    re, im = run_statevector(circuit)
    return outcome_probs(circuit, re, im)
