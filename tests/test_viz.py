"""Figure generation against the stored reference results."""

import os

import numpy as np
import pytest

from qcmrf_tpu.viz import whisker


def test_collect_and_render(reference_root, tmp_path):
    L_F, L_delta, WH = whisker.collect("simulation", reference_root)
    # graph 1, 10 reps x 3 scales
    assert L_F.shape == (30, 2)
    assert L_delta.shape == (30, 2)
    assert sorted(WH) == [0.1, 0.25, 0.5]
    assert all(len(v) == 10 for v in WH.values())
    # noiseless fidelities ~ 1; success rates fall with scale
    assert L_F[:, 1].min() > 0.99
    assert np.mean(WH[0.1]) > np.mean(WH[0.5])
    # BASELINE.md graph [[0,1]] deltas: 0.936 (0.1), 0.848 (0.25), 0.733 (0.5)
    assert abs(np.mean(WH[0.1]) - 0.936) < 0.01
    assert abs(np.mean(WH[0.5]) - 0.733) < 0.01

    out = whisker.render("simulation", L_delta, WH,
                         out_path=str(tmp_path / "success_simulation.pdf"))
    assert os.path.isfile(out) and os.path.getsize(out) > 1000


def test_noisy_pipeline_to_figure(reference_root, tmp_path):
    """Full pipeline: emulate hardware -> mitigate -> result files ->
    whisker figure, across all three scales."""
    import json

    import jax

    from qcmrf_tpu.models.suite import load_suite, reference_models_path
    from qcmrf_tpu.noise import backends as nb

    for scale in (0.1, 0.25, 0.5):
        suite = load_suite(reference_models_path(scale, reference_root),
                           scale)
        res = nb.run_noisy_suite(
            jax.random.PRNGKey(int(scale * 100)), suite,
            nb.preset("torino"), shots=2000,
        )
        d = tmp_path / f"res_{scale:g}"
        d.mkdir()
        with open(d / "result_emulated.json", "w") as f:
            json.dump(res, f)
        suite.save(str(d / f"models_{scale:g}.json"))

    L_F, L_delta, WH = whisker.collect("emulated", str(tmp_path))
    assert L_delta.shape == (30, 2)
    # noisy deltas still fall with scale
    assert np.mean(WH[0.1]) > np.mean(WH[0.5])
    out = whisker.render("emulated", L_delta, WH,
                         out_path=str(tmp_path / "success_emulated.pdf"))
    assert os.path.getsize(out) > 1000
