"""pmpx.transport bounded device probe + cli doctor.

The probe must (a) report a healthy CPU backend quickly, (b) convert a
wedged/hung transport into a bounded failure instead of blocking, and
(c) feed the ``doctor`` report that operators check before long runs.
"""

import json
import subprocess
import sys

import pytest

from pmpx import transport


def test_probe_healthy_cpu(monkeypatch, tmp_path):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("XLA_FLAGS", raising=False)
    r = transport.probe_device(timeout_s=120, cwd=str(tmp_path))
    assert r["ok"], r
    assert r["backend"] == "cpu" and r["n_devices"] >= 1
    assert r["probe_s"] < 120


def test_probe_times_out_bounded(monkeypatch):
    # simulate the wedge: the probe subprocess never answers
    def hang(*a, **k):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=k["timeout"])

    monkeypatch.setattr(transport.subprocess, "run", hang)
    r = transport.probe_device(timeout_s=3)
    assert not r["ok"] and "wedged" in r["error"]


def test_probe_reports_nonzero_exit(monkeypatch):
    class Out:
        returncode = 1
        stdout = ""
        stderr = "RuntimeError: Unable to initialize backend"

    monkeypatch.setattr(transport.subprocess, "run", lambda *a, **k: Out())
    r = transport.probe_device(timeout_s=3)
    assert not r["ok"] and "initialize backend" in r["error"]


def test_doctor_report_shape(monkeypatch, tmp_path):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PMPX_DATA_DIR", str(tmp_path))
    (tmp_path / "mnist.npz").write_bytes(b"x")  # presence check only
    rep = transport.doctor_report(probe_timeout_s=120)
    assert rep["device"]["ok"]
    assert rep["datasets"]["mnist_npz"] is True
    assert rep["datasets"]["cifar10_batches"] is False
    assert isinstance(rep["native_runtime"], bool)


def test_cli_doctor_exit_codes(monkeypatch, capsys):
    from pmpx import cli

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    rc = cli.main(["doctor", "--probe-timeout", "120"])
    rep = json.loads(capsys.readouterr().out)
    assert rc == 0 and rep["device"]["ok"]

    monkeypatch.setattr(
        transport, "probe_device",
        lambda **k: {"ok": False, "error": "x", "probe_s": 0.0},
    )
    rc = cli.main(["doctor"])
    assert rc == 1
