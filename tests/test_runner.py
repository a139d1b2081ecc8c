"""Experiment runner: engines produce schema-correct, statistically
consistent counts files."""

import json

import numpy as np
import pytest

from qcmrf_tpu.evaluation.harness import evaluate_suite
from qcmrf_tpu.models.suite import ModelSuite, generate_suite
from qcmrf_tpu.runners.run_experiment import main as run_main, run_suite


@pytest.fixture(scope="module")
def mini_suite():
    full = generate_suite(0.25)
    return ModelSuite(
        graphs=full.graphs[:3],
        thetas={j: full.thetas[j][:2] for j in range(3)},
        scale=0.25,
    )


def test_analytic_engine(mini_suite):
    counts = run_suite(mini_suite, shots=4000, engine="analytic", seed=1)
    assert len(counts) == 6
    for c in counts:
        assert sum(c.values()) == 4000
    res = evaluate_suite(mini_suite, dists=counts, norm=4000)
    assert all(r.mean_f > 0.99 for r in res)


def test_statevector_engine_agrees(mini_suite):
    counts = run_suite(mini_suite, shots=4000, engine="statevector", seed=2)
    res = evaluate_suite(mini_suite, dists=counts, norm=4000)
    assert all(r.mean_f > 0.99 for r in res)


def test_cli_writes_schema(tmp_path, mini_suite, monkeypatch):
    p = tmp_path / "models.json"
    mini_suite.save(str(p))
    out = run_main([
        "--scale", "0.25", "--shots", "500", "--engine", "analytic",
        "--models", str(p), "--outdir", str(tmp_path),
    ])
    with open(out) as f:
        data = json.load(f)
    assert isinstance(data, list) and len(data) == 6
    # reference schema: {bitstring: int} with constant key width per circuit
    for c in data:
        widths = {len(k) for k in c}
        assert len(widths) == 1
        assert all(isinstance(v, int) for v in c.values())


def test_noisy_engine_emits_hardware_schema(tmp_path, mini_suite):
    counts = run_suite(mini_suite, shots=1000, engine="noisy:torino", seed=3)
    assert set(counts.keys()) == {"quasi_dists", "metadata"}
    assert len(counts["quasi_dists"]) == 6
    assert all("readout_mitigation_overhead" in m for m in counts["metadata"])
    # quasi-dists feed the eval path with norm=1 (hardware convention)
    res = evaluate_suite(mini_suite, dists=counts["quasi_dists"], norm=1)
    assert all(r.mean_f > 0.95 for r in res)
