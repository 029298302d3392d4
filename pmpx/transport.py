"""Bounded device-health probing for unattended runs.

Remote TPU transports can wedge: a device call (or a fresh backend
init) blocks indefinitely with no error — observed for hours on the
tunnel this framework was built against.  Anything that runs
unattended (benchmarks, queue drivers, health checks) must therefore
never touch the device from its own process until a *bounded* probe in
a throwaway subprocess has confirmed the transport answers.

``probe_device`` is that probe; ``pmpx.cli doctor`` wraps it for
humans.  (scripts/queue_watchdog.py carries its own stdlib-only copy so
it stays importable without jax/pmpx.)
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

__all__ = ["probe_device", "doctor_report"]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE_CODE = (
    # some TPU plugins win over the JAX_PLATFORMS env var; re-assert the
    # caller's platform choice via jax.config (which wins back) before
    # the backend initializes — same trick as pmpx.cli.main
    "import json, os, jax, jax.numpy as jnp\n"
    "p = os.environ.get('JAX_PLATFORMS')\n"
    "if p:\n"
    "    jax.config.update('jax_platforms', p)\n"
    "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()\n"
    "print(json.dumps({'backend': jax.default_backend(), "
    "'n_devices': len(jax.devices()), "
    "'device_kind': jax.devices()[0].device_kind}))\n"
)


def probe_device(timeout_s: float = 120.0, cwd: str | None = None) -> dict:
    """Run a tiny device op in a bounded subprocess.

    Returns ``{"ok": True, "backend", "n_devices", "device_kind",
    "probe_s"}`` on success; ``{"ok": False, "error", "probe_s"}`` on
    timeout (the wedge signature) or nonzero exit.  Never blocks longer
    than ~``timeout_s``: output goes to temp files (not pipes — a
    grandchild such as a remote-compile helper inheriting a captured
    pipe would make the post-kill drain block forever) and on timeout
    the whole process *group* is killed, not just the direct child.
    ``cwd`` defaults to the repo root: some TPU plugins only register
    from there, and a cwd-dependent probe would misreport a healthy
    device as broken.
    """
    t0 = time.perf_counter()
    with tempfile.TemporaryFile("w+") as fout, \
            tempfile.TemporaryFile("w+") as ferr:
        proc = subprocess.Popen(
            [sys.executable, "-c", _PROBE_CODE],
            cwd=cwd or _REPO,
            stdout=fout, stderr=ferr, start_new_session=True,
        )
        try:
            rc = proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                pass
            proc.wait()
            return {
                "ok": False,
                "error": f"probe did not answer within {timeout_s:.0f}s "
                         "(transport wedged?)",
                "probe_s": round(time.perf_counter() - t0, 2),
            }
        dt = round(time.perf_counter() - t0, 2)
        fout.seek(0)
        ferr.seek(0)
        stdout, stderr = fout.read(), ferr.read()
    if rc != 0:
        return {
            "ok": False,
            "error": stderr.strip()[-500:],
            "probe_s": dt,
        }
    try:
        info = json.loads(stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return {
            "ok": False,
            "error": f"unparseable probe output: {stdout[-200:]!r}",
            "probe_s": dt,
        }
    return {"ok": True, "probe_s": dt, **info}


def doctor_report(probe_timeout_s: float = 120.0) -> dict:
    """Everything an operator needs to know before a long run."""
    from pmpx.data import dataset_presence
    from pmpx.runtime import native_available

    report = {
        "jax_platforms_env": os.environ.get("JAX_PLATFORMS", ""),
        "native_runtime": native_available(),
        "datasets": dataset_presence(),
        "device": probe_device(timeout_s=probe_timeout_s),
    }
    return report
