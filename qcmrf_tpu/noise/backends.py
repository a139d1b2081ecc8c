"""Noisy-backend presets emulating the reference's IBM hardware runs.

Each preset fixes a per-2q-gate depolarizing rate and per-qubit readout
errors chosen to land the emulated fidelity/success-rate statistics in the
range of the stored hardware results (BASELINE.md: torino F 0.94-1.00 with
size-dependent falloff; sherbrooke slightly better fidelity, lower delta).
These are *emulators for exercising the evaluation pipeline*, not device
calibrations.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax

from qcmrf_tpu.circuits.compiler import compile_qcmrf
from qcmrf_tpu.circuits.lower import basis_gate_counts
from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.noise.channels import (
    ReadoutError,
    apply_readout_confusion,
    depolarize,
)
from qcmrf_tpu.noise.mitigation import build_result_file, mitigate_counts
from qcmrf_tpu.sim import analytic, sampler


@dataclasses.dataclass(frozen=True)
class NoiseModel:
    name: str
    p_dep_2q: float           # depolarizing rate per 2q (cx) gate
    readout: ReadoutError     # applied to every measured bit
    mitigated: bool = False   # emit quasi-dists via inverse confusion


_PRESETS: Dict[str, NoiseModel] = {
    "torino": NoiseModel("torino", p_dep_2q=0.002,
                         readout=ReadoutError(0.012, 0.028), mitigated=True),
    "sherbrooke": NoiseModel("sherbrooke", p_dep_2q=0.0012,
                             readout=ReadoutError(0.008, 0.02),
                             mitigated=True),
    "ehningen": NoiseModel("ehningen", p_dep_2q=0.0025,
                           readout=ReadoutError(0.012, 0.03),
                           mitigated=True),
    "depolarizing": NoiseModel("depolarizing", p_dep_2q=0.002,
                               readout=ReadoutError(0.0, 0.0)),
    "readout-only": NoiseModel("readout-only", p_dep_2q=0.0,
                               readout=ReadoutError(0.015, 0.035),
                               mitigated=True),
}


def preset(name: str) -> NoiseModel:
    if name not in _PRESETS:
        raise ValueError(
            f"unknown noise preset {name!r}; have {sorted(_PRESETS)}"
        )
    return _PRESETS[name]


def measured_bits(mrf: MRF) -> List[int]:
    """Index-bit positions of the measured clbits: variables (bits 0..n-1)
    and per-clique ancillas (bits n+1..n+K). Bit ``n`` is the AND-workspace
    qubit, which the reference never measures (QCMRF.py:238-243) — its
    clbit is always '0' in stored keys, so readout noise must not touch it.
    """
    width = mrf.n + mrf.num_cliques + 1
    return list(range(mrf.n)) + list(range(mrf.n + 1, width))


def noisy_outcome_probs(mrf: MRF, model: NoiseModel) -> jax.Array:
    """Ideal joint distribution pushed through depolarizing + readout."""
    width = mrf.n + mrf.num_cliques + 1
    probs = analytic.joint_outcome_probs(mrf)
    ncx = basis_gate_counts(compile_qcmrf(mrf)).get("cx", 0)
    probs = depolarize(probs, model.p_dep_2q, ncx)
    if model.readout.e01 or model.readout.e10:
        bits = measured_bits(mrf)
        probs = apply_readout_confusion(
            probs, [model.readout] * len(bits), width, measured_bits=bits
        )
    return probs


def sample_noisy_counts(
    key: jax.Array, mrf: MRF, model: NoiseModel, shots: int
) -> Dict[str, int]:
    width = mrf.n + mrf.num_cliques + 1
    probs = noisy_outcome_probs(mrf, model)
    return sampler.sample_counts(key, probs, shots, width)


def calibrated_outcome_probs(mrf: MRF, cal, readout_sym: float) -> jax.Array:
    """Expected pre-mitigation outcome distribution of the calibrated
    emulator (see noise.fit.CalibratedNoiseModel): variable-register flip
    bias (gate-error proxy), true unmitigated ancilla drops, and a small
    symmetric true readout error on every measured bit."""
    n = mrf.n
    width = n + mrf.num_cliques + 1
    probs = analytic.joint_outcome_probs(mrf)
    if cal.var_bias:
        vbits = list(range(n))
        probs = apply_readout_confusion(
            probs, [ReadoutError(cal.var_bias, 0.0)] * n, width,
            measured_bits=vbits,
        )
    if cal.anc_drop:
        abits = list(range(n + 1, width))
        probs = apply_readout_confusion(
            probs, [ReadoutError(cal.anc_drop, 0.0)] * len(abits), width,
            measured_bits=abits,
        )
    if readout_sym:
        bits = measured_bits(mrf)
        probs = apply_readout_confusion(
            probs, [ReadoutError(readout_sym, readout_sym)] * len(bits),
            width, measured_bits=bits,
        )
    return probs


def _calibrated_mitigation_errors(
    mrf: MRF, cal, readout_sym: float
) -> List[ReadoutError]:
    """Assumed per-measured-bit errors the mitigation inverts: the exact
    symmetric readout on every bit, composed on ancilla bits with the
    never-applied ``anc_boost`` confusion (the deliberate mismatch whose
    inverse scales accepted mass by (1-boost)^-K — mitigation leakage)."""
    r, b = readout_sym, cal.anc_boost
    # confusion(r, r) @ confusion(b, 0) == confusion(r + b - 2rb, r)
    anc = ReadoutError(r + b - 2.0 * r * b, r)
    return [ReadoutError(r, r)] * mrf.n + [anc] * mrf.num_cliques


def run_calibrated_suite(key: jax.Array, suite, model,
                         shots: int = 10_000) -> dict:
    """Hardware-style result file from a per-graph calibrated model
    (noise.fit.CalibratedNoiseModel): quasi_dists + measured metadata."""
    quasi: List[Dict[str, float]] = []
    meta: List[dict] = []
    for j, C in enumerate(suite.graphs):
        cal = model.graphs[j]
        for theta in suite.thetas[j]:
            mrf = MRF.create(C, theta=theta)
            width = mrf.n + mrf.num_cliques + 1
            key, sub = jax.random.split(key)
            probs = calibrated_outcome_probs(mrf, cal, model.readout_sym)
            counts = sampler.sample_counts(sub, probs, shots, width)
            bits = measured_bits(mrf)
            q, m = mitigate_counts(
                counts,
                _calibrated_mitigation_errors(mrf, cal, model.readout_sym),
                width, measured_bits=bits,
            )
            quasi.append(q)
            meta.append(m)
    return build_result_file(quasi, meta)


def run_noisy_suite(
    key: jax.Array, suite, model: NoiseModel, shots: int = 10_000
) -> dict:
    """Full hardware-style result file: quasi_dists + metadata if the model
    is mitigated, else a plain counts list (reference file schemas)."""
    quasi: List[Dict[str, float]] = []
    meta: List[dict] = []
    counts_list: List[Dict[str, int]] = []
    for j, C in enumerate(suite.graphs):
        for theta in suite.thetas[j]:
            mrf = MRF.create(C, theta=theta)
            width = mrf.n + mrf.num_cliques + 1
            key, sub = jax.random.split(key)
            counts = sample_noisy_counts(sub, mrf, model, shots)
            if model.mitigated:
                bits = measured_bits(mrf)
                q, m = mitigate_counts(
                    counts, [model.readout] * len(bits), width,
                    measured_bits=bits,
                )
                quasi.append(q)
                meta.append(m)
            else:
                counts_list.append(counts)
    if model.mitigated:
        return build_result_file(quasi, meta)
    return counts_list
