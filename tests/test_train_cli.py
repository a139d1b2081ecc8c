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
    NLL estimate."""
    import pytest

    out = _run(tmp_path, "--steps", "60", "--checkpoint-every", "60",
               "--grad", "shots", "--grad-shots", "4096")
    with open(out) as f:
        fitted = json.load(f)
    # a 5-chain at theta=-0.5 init starts around nll ~ n*ln2 = 3.47;
    # 60 shot-gradient steps must move it well below the init plateau
    assert fitted["final_nll"] < 3.2
    # shots must split evenly over the mesh devices
    with pytest.raises(SystemExit):
        _run(tmp_path / "m", "--steps", "2", "--grad", "shots",
             "--grad-shots", "4097", "--mesh", "2x1")


def test_shots_gradient_sharded_mesh(tmp_path):
    """--grad shots --mesh 4x2: the shot draw + moment accumulation shard
    over all 8 devices (one (d,) psum per step) and converge to the same
    fit as the single-device shot gradient within stochastic-gradient
    tolerance (VERDICT round-3 item 6: the refusal is gone)."""
    a = tmp_path / "single"
    b = tmp_path / "mesh"
    _run(a, "--steps", "60", "--checkpoint-every", "60",
         "--grad", "shots", "--grad-shots", "8192")
    _run(b, "--steps", "60", "--checkpoint-every", "60",
         "--grad", "shots", "--grad-shots", "8192", "--mesh", "4x2")
    fa = json.load(open(a / "fitted_model.json"))
    fb = json.load(open(b / "fitted_model.json"))
    # different PRNG streams -> different stochastic paths; both must
    # leave the init plateau (~3.47) and land near the same optimum
    assert fb["final_nll"] < 3.2
    np.testing.assert_allclose(fb["theta"], fa["theta"], atol=0.35)


def test_elimination_training_past_n30(tmp_path):
    """n=60 chain: data as bit arrays, moment-target elimination MLE
    (VERDICT round-2 item 5 — the CLI exposes what the library could
    already do). Converges, checkpoints, resumes."""
    out = train_cli.main([
        "--graph", "chain:60", "--samples", "1024", "--steps", "30",
        "--lr", "0.15", "--checkpoint-every", "15",
        "--outdir", str(tmp_path), "--seed", "5",
    ])
    m = json.load(open(out))
    assert len(m["theta"]) == 59 * 4
    first = m["final_nll"]
    assert np.isfinite(first)
    # data was saved as (samples, n) bit arrays
    data = np.asarray(json.load(open(tmp_path / "data.json")))
    assert data.shape == (1024, 60) and set(np.unique(data)) <= {0, 1}
    # resume continues from the checkpoint and keeps improving
    out = train_cli.main([
        "--graph", "chain:60", "--samples", "1024", "--steps", "60",
        "--lr", "0.15", "--checkpoint-every", "30",
        "--outdir", str(tmp_path), "--seed", "5", "--resume",
        "--data", str(tmp_path / "data.json"),
    ])
    second = json.load(open(out))["final_nll"]
    assert second < first
    # NLL is bounded below by the entropy floor ~ n*ln2 at most
    assert second < 60 * np.log(2.0)


def test_big_n_guards(tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="mesh"):
        train_cli.main(["--graph", "chain:40", "--steps", "1",
                        "--mesh", "2x4", "--outdir", str(tmp_path)])
    with pytest.raises(SystemExit, match="shots"):
        train_cli.main(["--graph", "chain:40", "--steps", "1",
                        "--grad", "shots", "--outdir", str(tmp_path)])


def test_big_n_wide_structure_guards(tmp_path, monkeypatch):
    """Past n=30 with induced width above the elimination cap, the CLI
    refuses widths past the streaming sweep's int32 block-id cap
    (pointing at --grad ais, the round-5 route), and synthesizes
    bit-array Gibbs ground truth when --data is absent (the round-4
    'pass --data' refusal is gone). The synthesis path is driven at
    tiny n via the env threshold — at real n=31 a CPU test would take
    minutes."""
    import itertools

    import pytest

    k48 = tmp_path / "k48.json"
    k48.write_text(json.dumps(
        [list(p) for p in itertools.combinations(range(48), 2)]))
    with pytest.raises(SystemExit, match="tops out") as e:
        train_cli.main(["--graph", str(k48), "--steps", "1",
                        "--outdir", str(tmp_path)])
    assert "--grad ais" in str(e.value)

    from qcmrf_tpu.models import train as mtrain

    monkeypatch.setenv("QCMRF_BIG_N_THRESHOLD", "5")
    monkeypatch.setattr(mtrain, "_ELIM_WIDTH_CAP", 1)
    out = train_cli.main(["--graph", "chain:7", "--steps", "3",
                          "--samples", "300", "--platform", "cpu",
                          "--outdir", str(tmp_path)])
    data = json.load(open(tmp_path / "data.json"))
    assert np.asarray(data).shape == (300, 7)  # bit rows, Gibbs-synthesized
    assert np.isfinite(json.load(open(out))["final_nll"])


def test_big_wide_mesh_training(tmp_path, monkeypatch):
    """The past-n=30 wide-structure path accepts --mesh: moment-target
    training through the mesh-sharded streaming lnZ matches the
    single-device fit exactly (driven at tiny n via QCMRF_BIG_N_THRESHOLD
    and a lowered width cap — the big-path plumbing is scale-free)."""
    import itertools

    from qcmrf_tpu.models import train as mtrain

    monkeypatch.setenv("QCMRF_BIG_N_THRESHOLD", "8")
    monkeypatch.setattr(mtrain, "_ELIM_WIDTH_CAP", 3)
    k10 = tmp_path / "k10.json"
    k10.write_text(json.dumps(
        [list(p) for p in itertools.combinations(range(10), 2)]))
    rng = np.random.RandomState(3)
    bits = (rng.rand(64, 10) < 0.4).astype(int)
    dataf = tmp_path / "bits.json"
    dataf.write_text(json.dumps(bits.tolist()))

    common = ["--graph", str(k10), "--data", str(dataf), "--steps", "6",
              "--lr", "0.2"]
    out_m = train_cli.main(
        common + ["--mesh", "4x2", "--outdir", str(tmp_path / "mesh")])
    out_s = train_cli.main(
        common + ["--outdir", str(tmp_path / "single")])
    fm = json.load(open(out_m))
    fs = json.load(open(out_s))
    assert np.isfinite(fm["final_nll"])
    assert np.isclose(fm["final_nll"], fs["final_nll"], rtol=1e-4)
    np.testing.assert_allclose(fm["theta"], fs["theta"],
                               rtol=1e-4, atol=1e-6)


def test_empirical_moments_match_state_id_path():
    """Bit-array moments == state-id moments on a small graph (the two
    data representations must agree where both exist)."""
    import jax

    from qcmrf_tpu.evaluation.estimators import (
        clique_marginals_from_samples)
    from qcmrf_tpu.models import sample as msample
    from qcmrf_tpu.models import train as mtrain
    from qcmrf_tpu.models.mrf import MRF
    from qcmrf_tpu.utils.bits import bits_from_state_id

    rng = np.random.RandomState(0)
    mrf = MRF.create([[0, 1], [1, 2], [2, 3]],
                     theta=-np.abs(rng.randn(12)) * 0.4)
    x = np.asarray(
        msample.sample_exact(jax.random.PRNGKey(0), mrf, 4096))
    mu_ids = clique_marginals_from_samples(mrf, x)
    bits = np.asarray(bits_from_state_id(x, mrf.n))
    mu_bits = np.asarray(mtrain.empirical_moments_from_bits(mrf, bits))
    np.testing.assert_allclose(mu_bits, mu_ids, atol=1e-6)


def test_learn_structure_mode(tmp_path):
    """--learn-structure recovers a planted chain's edges from synthetic
    data and writes the selection report alongside the refit model."""
    out = _run(tmp_path, "--steps", "250", "--learn-structure",
               "--samples", "4096")
    with open(out) as f:
        fitted = json.load(f)
    rep = fitted["structure"]
    # candidates = all C(5,2)=10 pairs; one norm per template clique
    assert len(rep["candidates"]) == 10
    assert len(rep["interaction_norm"]) == 5 + 10
    # exact recovery: seed 3's planted chain has interaction strengths
    # 0.23..1.56, all detectable at 4096 samples under the default lam
    assert rep["selected"] == [[i, i + 1] for i in range(4)]
    # refit model = singletons + survivors, theta length consistent
    assert fitted["cliques"][:5] == [[v] for v in range(5)]
    assert len(fitted["theta"]) == sum(
        2 ** len(c) for c in fitted["cliques"])


def test_learn_structure_guards(tmp_path):
    import pytest

    # round 5: --mesh is ALLOWED with --learn-structure (the selection
    # sweep shards when the candidate template is wide; pinned in
    # tests/test_structure.py::test_structure_cli_mesh_and_big_threshold)
    # — only non-exact gradients refuse
    with pytest.raises(SystemExit, match="learn-structure"):
        _run(tmp_path, "--learn-structure", "--grad", "shots")
    with pytest.raises(SystemExit, match="learn-structure"):
        _run(tmp_path, "--learn-structure", "--grad", "ais")
