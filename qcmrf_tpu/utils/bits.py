"""Bit-order conventions for QCMRF state indexing.

Three conventions coexist in the reference (pinned in SURVEY.md Appendix A;
reference sites: /root/reference/QCMRF.py:219, /root/reference/eval.py:108-111):

1. **Variable order / state id**: variable 0 is the MSB of the integer state
   id: ``x = sum_v bit_v << (n - 1 - v)``.
2. **Circuit qubit layout**: variable ``v`` lives on qubit ``(n-1) - v``
   (reflection), qubit ``n`` is the shared AND-workspace qubit, qubits
   ``n+1 .. n+K`` are the per-clique Hadamard-test ancillas.
3. **Measurement keys**: qiskit-style bitstrings, clbit 0 rightmost. With the
   measurement wiring of the reference (qubit i -> clbit i), the *integer*
   value of a key equals the full-register state id with qubit 0 as LSB, and
   the post-selected keys are exactly those with ``int(key, 2) < 2**n``
   (all workspace/ancilla bits zero), whose value is then the variable state
   id from convention 1.

All helpers are jit-friendly (pure jnp, static ``n``).
"""

from __future__ import annotations

import jax.numpy as jnp


def var_bit(x, v, n: int):
    """Bit of variable ``v`` in state id ``x`` (variable 0 = MSB)."""
    return (x >> (n - 1 - v)) & 1


def var_to_qubit(v, n: int):
    """Circuit qubit holding variable ``v`` (reference QCMRF.py:219)."""
    return (n - 1) - v


def state_id_from_bits(bits, n: int):
    """State id from per-variable bits ``bits[..., v]`` (variable 0 = MSB)."""
    weights = jnp.asarray([1 << (n - 1 - v) for v in range(n)], dtype=bits.dtype)
    return (bits * weights).sum(axis=-1)


def bits_from_state_id(x, n: int):
    """Per-variable bits ``[..., v]`` of state id ``x`` (variable 0 = MSB)."""
    x = jnp.asarray(x)
    shifts = jnp.asarray([n - 1 - v for v in range(n)], dtype=jnp.int32)
    return (x[..., None] >> shifts) & 1


def key_string(index: int, width: int) -> str:
    """Counts-dict key for a full-register outcome integer (qiskit order)."""
    return format(index, "0{}b".format(width))


def key_to_index(key: str) -> int:
    return int(key, 2)


def postselect_mask_size(n: int) -> int:
    """Number of accepted outcomes after post-selection (= 2**n)."""
    return 1 << n
