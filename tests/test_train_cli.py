"""Train CLI: orbax checkpoint/resume, sharded mesh path, config files."""

import json
import os

import numpy as np

from qcmrf_tpu.runners import train_cli


def _run(tmp, *extra):
    return train_cli.main([
        "--graph", "chain:5", "--samples", "2048", "--lr", "0.1",
        "--outdir", str(tmp), "--seed", "3", *extra,
    ])


def test_checkpoint_resume_roundtrip(tmp_path):
    """Resume must pick up at the newest orbax step and keep improving."""
    _run(tmp_path, "--steps", "40", "--checkpoint-every", "20")
    with open(tmp_path / "fitted_model.json") as f:
        nll_40 = json.load(f)["final_nll"]
    # orbax layout: numbered step dirs under ckpt/
    assert (tmp_path / "ckpt" / "40").is_dir()

    out = _run(tmp_path, "--steps", "80", "--checkpoint-every", "20",
               "--resume")
    with open(out) as f:
        fitted = json.load(f)
    assert fitted["final_nll"] <= nll_40 + 1e-3  # resumed, not restarted
    assert len(fitted["theta"]) == 16  # chain:5 -> 4 edge cliques x 2^2


def test_sharded_mesh_matches_single_device(tmp_path):
    """--mesh 4x2 (amp x data over the 8 virtual devices) converges to the
    same fit as the single-device step."""
    a = tmp_path / "single"
    b = tmp_path / "mesh"
    _run(a, "--steps", "60")
    _run(b, "--steps", "60", "--mesh", "4x2")
    ta = json.load(open(a / "fitted_model.json"))["theta"]
    tb = json.load(open(b / "fitted_model.json"))["theta"]
    np.testing.assert_allclose(ta, tb, atol=5e-3)


def test_config_file_supplies_defaults(tmp_path):
    """--config values act as defaults; explicit flags still win; the
    effective config is dumped for provenance."""
    cfg = tmp_path / "cfg.json"
    # "data_seed", not "seed": Config.seed is the SUITE-generation
    # constant and deliberately has no flag on the train CLI
    cfg.write_text(json.dumps({"data_seed": 3,
                               "outdir": str(tmp_path / "o")}))
    train_cli.main([
        "--graph", "chain:4", "--samples", "1024", "--steps", "10",
        "--config", str(cfg),
    ])
    dumped = json.load(open(tmp_path / "o" / "train_config.json"))
    assert dumped["data_seed"] == 3
    assert dumped["steps"] == 10
    # fields NOT in the file keep the CLI's own defaults (a config file
    # must never smuggle in the Config dataclass's defaults)
    assert dumped["lr"] == 0.05
    assert dumped["checkpoint_every"] == 100
    assert os.path.isfile(tmp_path / "o" / "fitted_model.json")


def test_config_file_rejects_unknown_keys(tmp_path):
    import pytest

    cfg = tmp_path / "bad.json"
    cfg.write_text(json.dumps({"sedd": 3}))
    with pytest.raises(SystemExit, match="unknown keys"):
        train_cli.main(["--steps", "1", "--config", str(cfg)])


def test_config_file_does_not_override_cli_defaults(tmp_path):
    """A file mentioning only one key must leave every other default
    untouched (regression: Config dataclass defaults leaked through)."""
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"scale": 0.25}))
    import argparse

    from qcmrf_tpu.utils.config import parse_with_config

    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default="cpu")
    args = parse_with_config(parser, ["--config", str(cfg)])
    assert args.scale == 0.25
    assert args.seed == 0          # NOT Config's 1984
    assert args.platform == "cpu"  # NOT Config's "default"


def test_shots_gradient_mode(tmp_path):
    """--grad shots trains from circuit-sampled moments and improves the
    NLL estimate; incompatible with --mesh."""
    import pytest

    out = _run(tmp_path, "--steps", "60", "--checkpoint-every", "60",
               "--grad", "shots", "--grad-shots", "4096")
    with open(out) as f:
        fitted = json.load(f)
    # a 5-chain at theta=-0.5 init starts around nll ~ n*ln2 = 3.47;
    # 60 shot-gradient steps must move it well below the init plateau
    assert fitted["final_nll"] < 3.2
    with pytest.raises(SystemExit):
        _run(tmp_path / "m", "--steps", "2", "--grad", "shots",
             "--mesh", "2x1")
