"""Hang-proof JAX platform selection for every CLI.

The image's sitecustomize pins the single-chip TPU ("axon") platform, whose
backend init **blocks indefinitely** when the TPU tunnel is down (observed
live: a bare ``jax.devices()`` hung > 240 s) — any CLI that initializes the
default backend unguarded turns a tunnel outage into a silent hang. The
reference's own weakest point was execution-path robustness (its comment
"add try-catch recovery" around the hardware session,
/root/reference/run_experiment.py:74); this module is the framework-wide
fix: one helper every runner routes its ``--platform`` flag through.

Policy (:func:`resolve_platform`):

* ``cpu`` — pin the host platform (config-before-init beats the
  sitecustomize env pin); nothing can hang.
* ``default`` with a *small* workload — the CLI declares its workload
  small (e.g. the infer CLI below the enumeration threshold); route to
  CPU with a note, mirroring ``runners/eval.py``'s rationale (tiny models
  spend more time in per-graph accelerator compiles than in math).
  ``--platform tpu`` stays the explicit opt-in.
* anything else — the default backend may be the pinned TPU: **probe it
  out-of-process with a timeout** (same design as
  ``__graft_entry__._probe_device_count``; a bare backend init holds no
  device grant, so killing the probe child on timeout cannot wedge the
  chip) and fail with a clear, actionable message instead of hanging.

Test hooks: ``QCMRF_CLI_PROBE_TIMEOUT`` bounds the probe;
``QCMRF_CLI_PROBE_CODE`` replaces the probe child's code (e.g. with a
sleep) to simulate a blackholed tunnel deterministically.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional

_PROBE_TIMEOUT_ENV = "QCMRF_CLI_PROBE_TIMEOUT"
_PROBE_CODE_ENV = "QCMRF_CLI_PROBE_CODE"
_DEFAULT_TIMEOUT = 60.0

#: probe child: report the default platform and its device count. The
#: child inherits the environment, so the sitecustomize platform pin
#: applies to it exactly as it would to this process.
_PROBE_CODE = "import jax; print(jax.default_backend(), len(jax.devices()))"


def _backends_initialized() -> bool:
    from jax._src import xla_bridge

    return xla_bridge.backends_are_initialized()


def probe_default_backend(timeout: Optional[float] = None):
    """(platform_name, device_count) of the default backend, hang-proof.

    Returns ``(None, 0)`` when the probe child fails or times out —
    the signature of a TPU-tunnel outage. Instant when this process
    already initialized a backend (nothing left to hang).
    """
    import jax

    if _backends_initialized():
        try:
            return jax.default_backend(), len(jax.devices())
        except Exception:
            return None, 0
    timeout = float(
        os.environ.get(_PROBE_TIMEOUT_ENV, timeout or _DEFAULT_TIMEOUT))
    code = os.environ.get(_PROBE_CODE_ENV, _PROBE_CODE)
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            env=dict(os.environ), capture_output=True, text=True,
            timeout=timeout,
        )
        if r.returncode != 0:
            return None, 0
        name, count = r.stdout.strip().splitlines()[-1].split()
        return name, int(count)
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        return None, 0


def resolve_platform(requested: str, *, small: bool = False,
                     small_reason: str = "", prog: str = "qcmrf_tpu") -> str:
    """Apply a CLI's ``--platform`` choice without ever hanging.

    ``requested`` is the flag value (``cpu`` | ``tpu`` | ``default``);
    ``small`` declares the workload too small to benefit from the
    accelerator (the ``default`` choice then routes to CPU with a note
    carrying ``small_reason``). Returns the platform actually selected.
    Raises ``SystemExit`` with a diagnosable message when the requested
    accelerator backend cannot initialize within the probe timeout.
    """
    import jax

    if requested == "cpu" or (requested == "default" and small):
        if requested != "cpu":
            note = f" ({small_reason})" if small_reason else ""
            print(f"{prog}: running on cpu{note}; pass --platform tpu "
                  "to use the accelerator", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return "cpu"

    # The default backend may be the pinned TPU: probe before init.
    name, count = probe_default_backend()
    if not count:
        timeout = float(
            os.environ.get(_PROBE_TIMEOUT_ENV, _DEFAULT_TIMEOUT))
        raise SystemExit(
            f"{prog}: the default JAX backend did not initialize within "
            f"{timeout:.0f}s — TPU tunnel outage? Re-run with "
            "--platform cpu to run on the host, or retry once the "
            "device is reachable.")
    if requested == "tpu" and name == "cpu":
        raise SystemExit(
            f"{prog}: --platform tpu requested but the default backend "
            "is cpu (no accelerator platform is registered in this "
            "environment)")
    return name
