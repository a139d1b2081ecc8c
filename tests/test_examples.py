"""Smoke-run the example walkthroughs at reduced sizes.

Each example honors QCMRF_EXAMPLE_SMOKE (fewer shots/steps, CPU pinned
pre-backend-init) so the dev tier catches example rot without paying the
full-size runtimes (VERDICT round-3 item 7). Example 03's smoke mode
builds its own 8-device virtual CPU mesh (flags set pre-backend-init)
and drops to an n=12 table.
"""

import os
import subprocess
import sys

import pytest

_EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize(
    "name,output",
    [
        ("01_build_and_sample.py", None),
        ("02_reference_suite.py", None),
        ("03_large_scale_sharded.py", None),
        ("04_training.py", None),
        ("05_hardware_emulation.py", "/tmp/success_torino.pdf"),
        ("06_wide_structure_training.py", None),
        ("07_inference_serving.py", None),
        ("08_structure_learning.py", None),
        ("09_past_caps_ais.py", None),
    ],
)
def test_example_smoke(name, output):
    env = dict(os.environ)
    env["QCMRF_EXAMPLE_SMOKE"] = "1"
    if output and os.path.exists(output):
        os.remove(output)
    r = subprocess.run(
        [sys.executable, os.path.join(_EXAMPLES, name)],
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    if output:
        assert os.path.exists(output), f"{name} did not write {output}"
