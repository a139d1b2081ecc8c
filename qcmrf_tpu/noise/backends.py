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


def noisy_outcome_probs(mrf: MRF, model: NoiseModel) -> jax.Array:
    """Ideal joint distribution pushed through depolarizing + readout."""
    width = mrf.n + mrf.num_cliques + 1
    probs = analytic.joint_outcome_probs(mrf)
    ncx = basis_gate_counts(compile_qcmrf(mrf)).get("cx", 0)
    probs = depolarize(probs, model.p_dep_2q, ncx)
    if model.readout.e01 or model.readout.e10:
        probs = apply_readout_confusion(
            probs, [model.readout] * width, width
        )
    return probs


def sample_noisy_counts(
    key: jax.Array, mrf: MRF, model: NoiseModel, shots: int
) -> Dict[str, int]:
    width = mrf.n + mrf.num_cliques + 1
    probs = noisy_outcome_probs(mrf, model)
    return sampler.sample_counts(key, probs, shots, width)


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
                q, m = mitigate_counts(
                    counts, [model.readout] * width, width
                )
                quasi.append(q)
                meta.append(m)
            else:
                counts_list.append(counts)
    if model.mitigated:
        return build_result_file(quasi, meta)
    return counts_list
