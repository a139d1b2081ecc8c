"""Typed configuration for the framework's drivers.

The reference scatters its configuration across module constants
(``SHOTS/REPS/SCALE``, run_experiment.py:16-18), argparse flags
(eval.py:17-22, whisker.py:22-25) and a global seed (run_experiment.py:3).
This dataclass unifies them (SURVEY.md §5 "Config / flag system"): one
typed object covering suite scale, execution engine, shots, noise preset,
sharding mesh, and reproducibility seed — constructible from CLI args and
serializable to JSON for experiment provenance.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass
class Config:
    # suite
    scale: float = 0.5
    reps: int = 10
    seed: int = 1984          # suite-generation seed (reference parity)
    models_path: Optional[str] = None   # load instead of regenerate

    # execution
    engine: str = "analytic"  # analytic | statevector | noisy:<preset>
    shots: int = 10_000
    sample_seed: int = 0
    platform: str = "default"  # cpu | tpu | default

    # sharding
    mesh_shape: Tuple[int, ...] = ()    # () = single device
    mesh_axes: Tuple[str, ...] = ("amp",)

    # io
    outdir: str = "."

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        d["mesh_shape"] = tuple(d.get("mesh_shape", ()))
        d["mesh_axes"] = tuple(d.get("mesh_axes", ("amp",)))
        return Config(**d)

    def apply_platform(self) -> None:
        if self.platform != "default":
            import jax

            jax.config.update("jax_platforms", self.platform)

    def make_mesh(self):
        if not self.mesh_shape:
            return None
        import numpy as np
        import jax
        from jax.sharding import Mesh

        n = int(np.prod(self.mesh_shape))
        devs = np.array(jax.devices()[:n]).reshape(self.mesh_shape)
        return Mesh(devs, self.mesh_axes[: len(self.mesh_shape)])
