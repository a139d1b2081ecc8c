"""Fused whole-circuit Pallas kernel: one launch per batch of QCMRF circuits.

The reference executes each circuit as a long gate sequence inside Aer's
C++ loop (run_experiment.py:54-56). Gate-by-gate execution on TPU pays a
dispatch round-trip per gate; for the suite's circuit widths (<= 10 qubits,
statevector <= 8 x 128 floats) the whole state fits in registers, so this
kernel runs the ENTIRE gate-level circuit — Hadamard wall, every per-clique
[flags-phase -> X-conjugated inverse] real-part-extraction sandwich, final
H — inside one Pallas program, with the per-circuit gamma vector as the
only runtime input. The grid axis batches over parameter draws, so the 10
reps of a graph execute as one kernel launch.

Layout matches the dense engine exactly (qubit 0 = LSB; workspace qubit n
kept in the width but untouched), so the output |psi|^2 is the counts-key
distribution directly. Width is padded up to 7 qubits (one 128-lane row);
padding qubits stay |0> and the caller slices the first 2**width entries.

This is the gate-level *validation/arbitrary-circuit* fast path; the
closed-form sampler (ops.sampler_kernel) remains the flagship for pure
QCMRF sampling.
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.ops._common import interpret as _interpret

LANE = 128
_INV_SQRT2 = np.float32(1.0 / math.sqrt(2.0))

# the whole 2**width statevector is one VMEM block per grid step (that is
# the point of the kernel); past this width the planes no longer fit the
# 16 MB scoped-VMEM budget and the right tool is the plane engine
# (sim/tpu.py) or the sharded layer
_MAX_WIDTH = 16
# large-body kernel (fully unrolled circuit): remote Mosaic compile time
# grows with grid size (CLAUDE.md; ~28 min at grid 128 for comparable
# bodies), so batches are chunked into separate launches
_MAX_BATCH_GRID = 16


def _lane_matrix_h(q: int) -> np.ndarray:
    from qcmrf_tpu.ops.kernels import _lane_gate_matrix

    H = np.array([[_INV_SQRT2, _INV_SQRT2], [_INV_SQRT2, -_INV_SQRT2]],
                 dtype=np.float32)
    return _lane_gate_matrix(H, q)


def _apply_h(re, im, q: int, rows: int, hmats_ref=None):
    """Hadamard (real matrix) on qubit q of (rows, 128) planes.

    Lane-qubit matrices are symmetric (kron of symmetric blocks), so no
    transpose is needed; they arrive via ``hmats_ref`` (Pallas forbids
    captured array constants in kernels)."""
    if q < 7:
        M = hmats_ref[q]
        # HIGHEST precision: the MXU's default one-pass bf16 matmul loses
        # ~3 digits, which compounds over the gate sequence (~1e-3 in the
        # final probabilities); the f32 3-pass mode restores ~1e-6
        return (
            jnp.dot(re, M, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST),
            jnp.dot(im, M, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST),
        )
    s = 1 << (q - 7)  # row stride
    g = rows // (2 * s)

    def mix(p):
        p4 = p.reshape(g, 2, s, LANE)
        a, b = p4[:, 0], p4[:, 1]
        return jnp.stack(
            [(a + b) * _INV_SQRT2, (a - b) * _INV_SQRT2], axis=1
        ).reshape(rows, LANE)

    return mix(re), mix(im)


def _masked_rotation_tr(re, im, x, conds, ca1, sa, sgn=None):
    """Phase rotation where all (bit, want) conds hold, from HOST-side
    trig pairs: ``ca1 = cos(angle) - 1``, ``sa = sin(angle)`` (in-kernel
    transcendentals are VPU-expensive and scalar cos/sin explodes Mosaic
    compile time — same rotor trick as ops.kernels' diagonal kernels).
    ``sgn`` (optional, ±1 per element) flips the rotation direction per
    element: cos is even so only ``sa`` needs the factor."""
    mask = jnp.ones(x.shape, jnp.float32)
    for pos, want in conds:
        b = ((x >> pos) & 1).astype(jnp.float32)
        mask = mask * (b if want else (1.0 - b))
    c = 1.0 + ca1 * mask
    s = sa * mask if sgn is None else sa * mask * sgn
    return re * c - im * s, re * s + im * c


@functools.lru_cache(maxsize=256)
def _build_circuit_kernel(cliques: tuple, n: int):
    """Kernel running the full QCMRF circuit for one gamma vector."""
    K = len(cliques)
    width = n + K + 1
    pad_width = max(width, 7)
    rows = (1 << pad_width) // LANE

    # static per-(clique, y) masked-rotation conditions and gamma indices
    sandwich = []  # per clique: (anc_bit, [(conds, gamma_idx), ...])
    gi = 0
    for ii, C in enumerate(cliques):
        anc = n + 1 + ii
        blocks = []
        for y in itertools.product([0, 1], repeat=len(C)):
            conds = tuple(
                ((n - 1) - v, int(b)) for v, b in zip(C, y)
            )  # variable reflection, QCMRF.py:219
            blocks.append((conds, gi))
            gi += 1
        sandwich.append((anc, blocks))

    def kernel(trig_ref, hmats_ref, out_ref):
        # trig arrives unblocked in SMEM: (B, 2d) host-precomputed
        # (cos(2*gamma)-1, sin(2*gamma)) pairs; this program's row is
        # selected by grid position
        b = pl.program_id(0)
        riota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
        x = riota * LANE + ciota

        # state after the Hadamard wall (QCMRF.py:204-205), closed form:
        # H^{(n)}|0> = uniform 2^{-n/2} over the n variable bits with
        # ancilla/workspace/padding bits 0 — no wall gates executed
        nonvar = ((1 << pad_width) - 1) ^ ((1 << n) - 1)
        re = jnp.where((x & nonvar) == 0,
                       np.float32(2.0 ** (-0.5 * n)), np.float32(0.0))
        im = jnp.zeros((rows, LANE), jnp.float32)

        for anc, blocks in sandwich:
            # H(anc) · cU_C · X(anc) · cU_C^-1 · X(anc) · H(anc).
            # cU_C applies e^{+2i*gamma} on the anc=1 branch and the
            # X-conjugated inverse e^{-2i*gamma} on anc=0 — ONE fused
            # rotation per (clique, y) with a per-element sign from the
            # ancilla bit (cos is even, so only sin flips).
            re, im = _apply_h(re, im, anc, rows, hmats_ref)
            sgn = 2.0 * ((x >> anc) & 1).astype(jnp.float32) - 1.0
            for conds, gidx in blocks:
                re, im = _masked_rotation_tr(
                    re, im, x, conds,
                    trig_ref[b, 2 * gidx], trig_ref[b, 2 * gidx + 1],
                    sgn,
                )
            re, im = _apply_h(re, im, anc, rows, hmats_ref)

        out_ref[0] = re * re + im * im

    return kernel, rows, pad_width


@functools.lru_cache(maxsize=1)
def _lane_h_stack() -> np.ndarray:
    return np.stack([_lane_matrix_h(q) for q in range(7)])


@functools.partial(jax.jit, static_argnums=(0, 1))
def _circuit_call(cliques: tuple, n: int, gammas):
    B = gammas.shape[0]
    kernel, rows, pad_width = _build_circuit_kernel(cliques, n)
    hmats = jnp.asarray(_lane_h_stack())
    # host-side rotor pairs (cos(2g)-1, sin(2g)) interleaved per gamma:
    # the kernel applies phases by composition instead of in-kernel
    # transcendentals (VPU cost + Mosaic scalar-cos compile blowup)
    two_g = 2.0 * gammas
    trig = jnp.stack([jnp.cos(two_g) - 1.0, jnp.sin(two_g)],
                     axis=-1).reshape(B, -1)

    def launch(g):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (g.shape[0], rows, LANE), jnp.float32),
            grid=(g.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # trig, unblocked
                pl.BlockSpec((7, LANE, LANE), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, LANE), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(g, hmats)

    # chunk the batch so no single launch exceeds _MAX_BATCH_GRID grid
    # steps of this large-body kernel (compile-time guard); chunks reuse
    # the same program when their shapes match
    chunks = [
        launch(trig[s: s + _MAX_BATCH_GRID])
        for s in range(0, B, _MAX_BATCH_GRID)
    ]
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)
    return out.reshape(B, rows * LANE)


def batched_circuit_probs(cliques, thetas, beta: float = 1.0) -> jax.Array:
    """Gate-level outcome distributions for a stack of thetas, one launch.

    Returns ``(B, 2**(n+K+1))`` — identical statistics to
    ``sim.dense.simulate_probs(compile_qcmrf(...))`` per circuit, executed
    entirely in one fused kernel (the whole statevector lives in
    registers/VMEM across all gates).
    """
    from qcmrf_tpu.circuits.params import (theta_to_gamma,
                                           validate_theta_domain)

    cliques = tuple(tuple(int(v) for v in C) for C in cliques)
    template = MRF.create([list(C) for C in cliques])
    n, K = template.n, template.num_cliques
    width = n + K + 1
    if width > _MAX_WIDTH:
        raise ValueError(
            f"circuit width {width} exceeds the whole-state kernel's "
            f"VMEM budget (max {_MAX_WIDTH}); use sim.tpu or "
            "parallel.sharded for wider circuits"
        )
    if not isinstance(thetas, jax.core.Tracer):
        # concrete input: validate the domain (theta > 0 would silently
        # produce NaN gammas) and keep the arccos in float64 — the
        # float32 round-trip loses the conditioning params._xp documents
        thetas64 = np.asarray(thetas, np.float64)
        validate_theta_domain(thetas64)
        gammas = jnp.asarray(
            np.asarray(theta_to_gamma(thetas64, beta)), jnp.float32)
    else:
        gammas = theta_to_gamma(
            jnp.asarray(thetas, jnp.float32), beta).astype(jnp.float32)
    probs = _circuit_call(cliques, n, gammas)
    return probs[:, : 1 << width]
