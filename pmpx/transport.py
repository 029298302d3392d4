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
import subprocess
import sys
import time

__all__ = ["probe_device", "doctor_report"]

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
    than ``timeout_s``.
    """
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            cwd=cwd or os.getcwd(),
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return {
            "ok": False,
            "error": f"probe did not answer within {timeout_s:.0f}s "
                     "(transport wedged?)",
            "probe_s": round(time.perf_counter() - t0, 2),
        }
    dt = round(time.perf_counter() - t0, 2)
    if out.returncode != 0:
        return {
            "ok": False,
            "error": out.stderr.strip()[-500:],
            "probe_s": dt,
        }
    try:
        info = json.loads(out.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return {
            "ok": False,
            "error": f"unparseable probe output: {out.stdout[-200:]!r}",
            "probe_s": dt,
        }
    return {"ok": True, "probe_s": dt, **info}


def _dataset_formats(data_dir: str) -> dict:
    """Which real-dataset formats are present under the data dir."""
    j = os.path.join
    return {
        "data_dir": data_dir,
        "mnist_npz": os.path.exists(j(data_dir, "mnist.npz")),
        "mnist_idx": any(
            os.path.exists(j(data_dir, sub, "train-images-idx3-ubyte" + ext))
            for sub in ("", "MNIST/raw") for ext in ("", ".gz")
        ),
        "cifar10_npz": os.path.exists(j(data_dir, "cifar10.npz")),
        "cifar10_batches": os.path.exists(
            j(data_dir, "cifar-10-batches-py", "data_batch_1")
        ),
    }


def doctor_report(probe_timeout_s: float = 120.0) -> dict:
    """Everything an operator needs to know before a long run."""
    from pmpx.runtime import native_available

    report = {
        "jax_platforms_env": os.environ.get("JAX_PLATFORMS", ""),
        "native_runtime": native_available(),
        "datasets": _dataset_formats(
            os.environ.get("PMPX_DATA_DIR", "./data")
        ),
        "device": probe_device(timeout_s=probe_timeout_s),
    }
    return report
