"""The experiment model suite: 7 graphs x 10 reps x prior scale.

Reproduces the reference's seeded suite generator
(/root/reference/run_experiment.py:20-38, replicated eval.py:26-45 and
whisker.py:39-58): ``theta = -halfnorm.rvs(scale)`` drawn from the global
numpy RNG seeded with 1984, giving bit-reproducible ``models_{scale}.json``
files (verified, SURVEY.md Appendix A item 6).

Two sources are supported:

* :func:`generate_suite` — regenerate from the seed (requires scipy and the
  legacy MT19937 stream; bit-exactness is asserted by tests against the
  stored files).
* :func:`load_suite` — load a stored ``models_{scale}.json`` (the safe
  parity path; SURVEY.md §7 item 6).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from qcmrf_tpu.models.mrf import MRF

# The fixed 7-graph suite (reference run_experiment.py:20).
GRAPHS: List[List[List[int]]] = [
    [[0]],
    [[0, 1]],
    [[0, 1], [1, 2], [2, 3]],
    [[0, 1], [1, 2], [2, 3], [3, 4]],
    [[0, 1, 2]],
    [[0, 1, 2], [2, 3, 4]],
    [[0, 1, 2, 3]],
]

REPS = 10  # reference run_experiment.py:17
SHOTS = 10_000  # reference run_experiment.py:16
SCALES = (0.1, 0.25, 0.5)
SEED = 1984  # reference run_experiment.py:3


def _dim(cliques: Sequence[Sequence[int]]) -> int:
    return sum(1 << len(C) for C in cliques)


@dataclass(frozen=True)
class ModelSuite:
    """A full suite: per-graph lists of theta draws."""

    graphs: List[List[List[int]]]
    thetas: Dict[int, List[List[float]]]  # graph index -> reps x d
    scale: float

    @property
    def num_circuits(self) -> int:
        return sum(len(v) for v in self.thetas.values())

    def mrfs(self) -> List[MRF]:
        """All (graph, rep) models in suite order (graph-major)."""
        out = []
        for j, C in enumerate(self.graphs):
            for theta in self.thetas[j]:
                out.append(MRF.create(C, theta=theta))
        return out

    def to_json_dict(self) -> dict:
        """Same schema as the stored ``models_{scale}.json`` files."""
        return {
            "GRAPHS": self.graphs,
            "THETAS": {str(k): v for k, v in self.thetas.items()},
        }

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(json.dumps(self.to_json_dict(), indent=4))


def generate_suite(
    scale: float, reps: int = REPS, seed: Optional[int] = SEED
) -> ModelSuite:
    """Regenerate the suite exactly as the reference does.

    Seeds the *global* legacy numpy RNG (as run_experiment.py:3 does once
    per process) and draws ``-halfnorm.rvs(scale, size=d)`` per (graph, rep)
    in graph-major order (run_experiment.py:23-33).
    """
    from scipy.stats import halfnorm

    if seed is not None:
        np.random.seed(seed)
    thetas: Dict[int, List[List[float]]] = {}
    for j, C in enumerate(GRAPHS):
        d = _dim(C)
        for _ in range(reps):
            theta = -halfnorm.rvs(loc=0, scale=float(scale), size=d)
            thetas.setdefault(j, []).append(theta.tolist())
    return ModelSuite(graphs=[list(map(list, g)) for g in GRAPHS],
                      thetas=thetas, scale=float(scale))


def load_suite(path: str, scale: Optional[float] = None) -> ModelSuite:
    """Load a stored ``models_{scale}.json`` (reference schema)."""
    with open(path) as f:
        R = json.load(f)
    thetas = {int(k): v for k, v in R["THETAS"].items()}
    if scale is None:
        base = os.path.basename(path)
        try:
            scale = float(base.replace("models_", "").replace(".json", ""))
        except ValueError:
            scale = float("nan")
    return ModelSuite(graphs=R["GRAPHS"], thetas=thetas, scale=scale)


def reference_models_path(scale: float, root: str = "/root/reference") -> str:
    p = os.path.join(root, f"res_{scale:g}", f"models_{scale:g}.json")
    if os.path.isfile(p):
        return p
    # res_0.5 stores the suite as plain "models.json"
    return os.path.join(root, f"res_{scale:g}", "models.json")


def reference_results_path(
    scale: float, backend: str = "simulation", root: str = "/root/reference"
) -> str:
    return os.path.join(root, f"res_{scale:g}", f"result_{backend}.json")
