"""Tensored readout-error mitigation producing quasi-probability dists.

Emulates the statistical signature of IBM Runtime's resilience_level=1
output (reference run_experiment.py:65-68): applying the *inverse* readout
confusion to an empirical counts distribution yields a quasi-probability
distribution that can contain negative entries (the stored torino file has
107 such entries across 70 dists, SURVEY.md Appendix A item 7), plus
per-circuit metadata with the mitigation overhead — so the evaluation
path's tolerance of negative/broad-support dists is exercised end-to-end.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from qcmrf_tpu.noise.channels import ReadoutError, mitigation_overhead
from qcmrf_tpu.utils.bits import key_string


def mitigate_counts(
    counts: Dict[str, int],
    errors: Sequence[ReadoutError],
    width: int,
    measured_bits: Optional[Sequence[int]] = None,
) -> Tuple[Dict[str, float], dict]:
    """Invert per-bit confusion over a counts dict.

    Returns ``(quasi_dist, metadata)`` in the stored hardware schema:
    quasi-probabilities summing to 1 (possibly negative entries) and
    metadata with ``shots``, ``readout_mitigation_overhead`` and the
    measured ``readout_mitigation_time`` (wall seconds of the inversion,
    the analog of the per-circuit timing in res_*/result_torino.json).
    ``measured_bits`` restricts the inversion to the bits that carry a
    real measurement (the AND-workspace bit never does).
    """
    t0 = time.perf_counter()
    if measured_bits is None:
        measured_bits = range(width)
    shots = sum(counts.values())
    dense = np.zeros(1 << width, dtype=np.float64)
    for k, v in counts.items():
        dense[int(k, 2)] += v / shots

    # tensored inverse confusion, bit by bit (bit b = key char width-1-b)
    for bit, err in zip(measured_bits, errors):
        lo = 1 << bit
        hi = 1 << (width - 1 - bit)
        dense = np.einsum(
            "mt,htl->hml", err.inverse, dense.reshape(hi, 2, lo)
        ).reshape(-1)

    quasi = {
        key_string(i, width): float(p)
        for i, p in enumerate(dense)
        if p != 0.0
    }
    # key-for-key the stored hardware metadata schema (res_0.1/
    # result_torino.json metadata[*]): shots, circuit_metadata (empty dict
    # in every stored row), the two mitigation stats, and the runtime
    # warning string ("Optimization level clipped from 3 to 1" upstream —
    # here it flags the emulation itself)
    meta = {
        "shots": shots,
        "circuit_metadata": {},
        "readout_mitigation_overhead": mitigation_overhead(
            errors[: len(list(measured_bits))]
        ),
        "readout_mitigation_time": time.perf_counter() - t0,
        "warning": "Emulated backend (qcmrf_tpu noise model), not hardware",
    }
    return quasi, meta


def build_result_file(
    quasi_dists: List[Dict[str, float]], metadata: List[dict]
) -> dict:
    """Hardware result-file schema (res_*/result_torino.json)."""
    return {"quasi_dists": quasi_dists, "metadata": metadata}
