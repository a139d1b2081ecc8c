"""Every CLI's backend init is hang-proof (round-4 verdict item 1).

The pinned axon TPU platform's backend init blocks indefinitely on a
tunnel outage (observed live: ``jax.devices()`` hung > 240 s), and the
round-4 infer CLI reproducibly hung forever on a tiny query because it
initialized the default backend unguarded. Every CLI now routes
``--platform`` through ``qcmrf_tpu.utils.device.resolve_platform``:
these tests blackhole the out-of-process probe (the
``QCMRF_CLI_PROBE_CODE`` hook, same pattern as the dryrun's
``QCMRF_DRYRUN_PROBE_CODE``) and assert a *bounded, diagnosable*
failure — and that small-model serving never touches the probe at all.
"""

import json

import numpy as np
import pytest

from qcmrf_tpu.utils import device as udevice


@pytest.fixture()
def blackholed_probe(monkeypatch):
    """Simulate a fresh process facing a dead TPU tunnel: backends look
    uninitialized, and the probe child sleeps past its 1 s timeout."""
    monkeypatch.setattr(udevice, "_backends_initialized", lambda: False)
    monkeypatch.setenv("QCMRF_CLI_PROBE_CODE", "import time; time.sleep(30)")
    monkeypatch.setenv("QCMRF_CLI_PROBE_TIMEOUT", "1")


def _assert_diagnosable(excinfo):
    msg = str(excinfo.value)
    assert "did not initialize" in msg and "--platform cpu" in msg


# ---------------------------------------------------------------------------
# resolve_platform unit behavior
# ---------------------------------------------------------------------------


def test_resolve_cpu_never_probes(blackholed_probe):
    # 'cpu' must not touch the probe (a sleeping probe would raise/stall)
    assert udevice.resolve_platform("cpu") == "cpu"


def test_resolve_small_default_routes_to_cpu(blackholed_probe, capsys):
    out = udevice.resolve_platform(
        "default", small=True, small_reason="tiny", prog="t")
    assert out == "cpu"
    assert "--platform tpu" in capsys.readouterr().err


def test_resolve_default_big_fails_bounded(blackholed_probe):
    with pytest.raises(SystemExit) as e:
        udevice.resolve_platform("default", small=False, prog="t")
    _assert_diagnosable(e)


def test_resolve_tpu_on_cpu_only_host(monkeypatch):
    monkeypatch.setattr(udevice, "_backends_initialized", lambda: False)
    monkeypatch.setenv("QCMRF_CLI_PROBE_CODE", "print('cpu 8')")
    with pytest.raises(SystemExit) as e:
        udevice.resolve_platform("tpu", prog="t")
    assert "no accelerator" in str(e.value)


def test_resolve_probe_success_path(monkeypatch):
    monkeypatch.setattr(udevice, "_backends_initialized", lambda: False)
    monkeypatch.setenv("QCMRF_CLI_PROBE_CODE", "print('axon 1')")
    assert udevice.resolve_platform("tpu", prog="t") == "axon"


# ---------------------------------------------------------------------------
# one bounded-failure test per CLI (the round-3/4 hang-proofing reached
# only __graft_entry__ and bench.py; these pin the user-facing surfaces)
# ---------------------------------------------------------------------------


def test_infer_cli_bounded_failure(blackholed_probe):
    from qcmrf_tpu.runners import infer_cli

    # n=28 is past the small-model threshold -> 'default' must probe
    with pytest.raises(SystemExit) as e:
        infer_cli.main(["--graph", "chain:28", "--query", "lnz"])
    _assert_diagnosable(e)


def test_infer_cli_small_model_skips_probe(blackholed_probe, capsys):
    # the round-4 live repro: infer --graph chain:4 --query lnz hung
    # > 120 s on a tunnel outage. Small models now route to cpu without
    # ever touching the backend probe (the blackholed probe would fail
    # this test if consulted).
    from qcmrf_tpu.runners import infer_cli

    r = infer_cli.main(["--graph", "chain:4", "--query", "lnz"])
    assert np.isclose(r["lnz"], 4 * np.log(2.0))  # theta=0: lnZ = n ln 2
    assert "--platform tpu" in capsys.readouterr().err


def test_train_cli_bounded_failure(blackholed_probe, tmp_path):
    from qcmrf_tpu.runners import train_cli

    with pytest.raises(SystemExit) as e:
        train_cli.main(["--graph", "chain:24", "--steps", "1",
                        "--outdir", str(tmp_path)])
    _assert_diagnosable(e)


def test_run_experiment_cli_bounded_failure(blackholed_probe, tmp_path):
    from qcmrf_tpu.runners import run_experiment

    with pytest.raises(SystemExit) as e:
        run_experiment.main(["--engine", "analytic",
                             "--outdir", str(tmp_path)])
    _assert_diagnosable(e)


def test_eval_cli_bounded_failure(blackholed_probe):
    from qcmrf_tpu.runners import eval as eval_cli

    with pytest.raises(SystemExit) as e:
        eval_cli.main(["--results", "result_simulation.json",
                       "--platform", "tpu"])
    _assert_diagnosable(e)


def test_whisker_cli_bounded_failure(blackholed_probe):
    from qcmrf_tpu.viz import whisker

    with pytest.raises(SystemExit) as e:
        whisker.main(["--backend", "simulation", "--platform", "tpu"])
    _assert_diagnosable(e)


# ---------------------------------------------------------------------------
# infer CLI ergonomics (round-4 verdict item 6 + advisor findings)
# ---------------------------------------------------------------------------


def test_infer_theta_inline_and_file(tmp_path):
    from qcmrf_tpu.models import elimination as ve
    from qcmrf_tpu.models.mrf import MRF
    from qcmrf_tpu.runners import infer_cli

    theta = [-0.3, -0.1, -0.7, -0.2, -0.5, -0.4, -0.6, -0.8]
    ref = float(ve.log_partition(
        MRF.create([[0, 1], [1, 2]], theta=np.asarray(theta))))

    inline = infer_cli.main(["--graph", "chain:3", "--query", "lnz",
                             "--theta", json.dumps(theta)])
    assert np.isclose(inline["lnz"], ref, rtol=1e-6)

    p = tmp_path / "theta.json"
    p.write_text(json.dumps(theta))
    from_file = infer_cli.main(["--graph", "chain:3", "--query", "lnz",
                                "--theta", str(p)])
    assert from_file["lnz"] == inline["lnz"]


def test_infer_theta_scale_random_init():
    from qcmrf_tpu.runners import infer_cli

    r1 = infer_cli.main(["--graph", "chain:3", "--query", "lnz",
                         "--theta-scale", "0.4", "--theta-seed", "7"])
    r2 = infer_cli.main(["--graph", "chain:3", "--query", "lnz",
                         "--theta-scale", "0.4", "--theta-seed", "7"])
    assert r1["lnz"] == r2["lnz"]          # seeded: reproducible
    assert r1["lnz"] < 3 * np.log(2.0)     # theta < 0 shrinks Z below 2^n


def test_infer_method_query_validation():
    from qcmrf_tpu.runners import infer_cli

    with pytest.raises(SystemExit) as e:
        infer_cli.main(["--graph", "chain:4", "--query", "map",
                        "--method", "ais"])
    assert "lnz, marginals and prob only" in str(e.value)
    with pytest.raises(SystemExit) as e:
        infer_cli.main(["--graph", "chain:4", "--query", "lnz",
                        "--method", "gibbs"])
    assert "sample only" in str(e.value)
    with pytest.raises(SystemExit) as e:
        infer_cli.main(["--graph", "chain:4", "--query", "sample",
                        "--method", "ais"])
    assert "lnz, marginals and prob only" in str(e.value)


def test_infer_batch_validates_methods_up_front(tmp_path, capsys):
    from qcmrf_tpu.runners import infer_cli

    q = tmp_path / "queries.jsonl"
    q.write_text(json.dumps({"query": "lnz"}) + "\n"
                 + json.dumps({"query": "map", "method": "ais"}) + "\n")
    with pytest.raises(SystemExit) as e:
        infer_cli.main(["--graph", "chain:4", "--queries", str(q)])
    assert "line 2" in str(e.value)
    # nothing was answered before the failure (validated up front)
    assert capsys.readouterr().out.strip() == ""


def test_infer_ais_chains_round_up_on_mesh():
    import jax

    from qcmrf_tpu.runners import infer_cli

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    # 10 chains over a 4-device mesh: rounded up to 12, noted, no raw
    # ValueError traceback (round-4 advisor finding)
    r = infer_cli.main(["--graph", "chain:5", "--query", "lnz",
                        "--method", "ais", "--ais-chains", "10",
                        "--ais-temps", "8", "--mesh", "4x1",
                        "--platform", "cpu"])
    assert r["ais"]["chains"] == 12
    assert "rounded up" in r["note"]


def test_infer_theta_bad_input_clean_error(tmp_path):
    from qcmrf_tpu.runners import infer_cli

    with pytest.raises(SystemExit, match="not a readable"):
        infer_cli.main(["--graph", "chain:3", "--query", "lnz",
                        "--theta", str(tmp_path / "missing.json")])
    with pytest.raises(SystemExit, match="not a readable"):
        infer_cli.main(["--graph", "chain:3", "--query", "lnz",
                        "--theta", "[not json"])
