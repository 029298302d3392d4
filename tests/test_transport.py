"""pmpx.transport bounded device probe + cli doctor.

The probe must (a) report a healthy CPU backend quickly, (b) convert a
wedged/hung transport into a bounded failure instead of blocking, and
(c) feed the ``doctor`` report that operators check before long runs.
"""

import json
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
    # simulate the wedge: the probe subprocess never answers — and give
    # it a grandchild holding the output stream, the case that blocks a
    # pipe-draining implementation forever after the kill
    import time as _time

    monkeypatch.setattr(
        transport, "_PROBE_CODE",
        "import subprocess, sys, time\n"
        "subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(60)'])\n"
        "time.sleep(60)\n",
    )
    t0 = _time.time()
    r = transport.probe_device(timeout_s=2)
    assert not r["ok"] and "wedged" in r["error"]
    assert _time.time() - t0 < 30  # bounded despite the grandchild


def test_probe_reports_nonzero_exit(monkeypatch):
    monkeypatch.setattr(
        transport, "_PROBE_CODE",
        "import sys\n"
        "sys.stderr.write('RuntimeError: Unable to initialize backend')\n"
        "sys.exit(1)\n",
    )
    r = transport.probe_device(timeout_s=30)
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
