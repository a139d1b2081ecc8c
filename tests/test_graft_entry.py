"""Driver contract: entry() jit-compiles; dryrun_multichip runs on the
virtual mesh (what the round driver executes) — including from a fresh
process with the image's default env (TPU platform pinned), which is
exactly how the driver invokes it."""

import os
import subprocess
import sys
import json

import numpy as np
import pytest

import jax


sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    x, a = jax.block_until_ready(out)
    assert x.shape == (8192,)
    assert a.shape == (8192,)
    # variable draws uniform over 2^20
    assert int(np.asarray(x).min()) >= 0
    assert int(np.asarray(x).max()) < (1 << 20)


@pytest.mark.parametrize(
    "n_devices", [2, pytest.param(8, marks=pytest.mark.slow)]
)
def test_dryrun_multichip(n_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(n_devices)  # asserts finite loss + sharded==dense


def test_flags_rewrite_replaces_existing_count():
    import __graft_entry__ as g

    out = g._flags_with_device_count(
        "--foo --xla_force_host_platform_device_count=8 --bar", 16
    )
    assert out.count("xla_force_host_platform_device_count") == 1
    assert "device_count=16" in out
    assert "--foo" in out and "--bar" in out


_DRIVER_CODE = (
    "import sys; sys.path.insert(0, '/root/repo'); "
    "import __graft_entry__ as g; g.dryrun_multichip(8); "
    "print('dryrun ok')"
)


def _driver_env(**extra):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("QCMRF_DRYRUN_CHILD", None)
    # the image pins the TPU platform; dryrun must override it pre-init
    env["JAX_PLATFORMS"] = "axon"
    env.update(extra)
    return env


@pytest.mark.slow
def test_dryrun_driver_env():
    """Run the dryrun the way the round driver does: a fresh interpreter
    with the image's default platform pin (axon TPU) and no
    xla_force_host_platform_device_count. The function must bootstrap the
    virtual CPU mesh itself (round-1 MULTICHIP artifact failure). Uses the
    real device probe — now bounded, so tunnel outage costs at most the
    60 s probe budget instead of hanging the test (round-3 failure).
    """
    r = subprocess.run(
        [sys.executable, "-c", _DRIVER_CODE],
        env=_driver_env(),
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun ok" in r.stdout


@pytest.mark.slow
def test_dryrun_survives_hung_tunnel():
    """Round-3 regression: a blackholed TPU tunnel hangs backend init
    inside ``jax.devices()`` (> 240 s observed live). The device probe
    must be bounded and fall back to the virtual CPU mesh. Simulated by
    making the probe child sleep forever with a 5 s probe budget."""
    r = subprocess.run(
        [sys.executable, "-c", _DRIVER_CODE],
        env=_driver_env(
            QCMRF_DRYRUN_PROBE_CODE="import time; time.sleep(600)",
            QCMRF_DRYRUN_PROBE_TIMEOUT="5",
        ),
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun ok" in r.stdout


def test_bench_survives_hung_tunnel():
    """bench.py is the driver's OTHER unbounded device touch: with the
    tunnel down, its first ``block_until_ready`` would hang forever. The
    bounded probe must instead emit the one-JSON-line contract with an
    error field and exit 0. Simulated with a sleeping probe child."""
    env = dict(os.environ)
    env.update(
        QCMRF_BENCH_PROBE_CODE="import time; time.sleep(600)",
        QCMRF_BENCH_PROBE_TIMEOUT="2",
        QCMRF_BENCH_PROBE_ATTEMPTS="1",
    )
    r = subprocess.run(
        [sys.executable, "bench.py"],
        env=env, cwd="/root/repo", capture_output=True, text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["metric"] == "qcmrf_sample_shots_per_sec"
    assert "tpu_unreachable" in line["error"]
