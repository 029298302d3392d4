"""Driver entry points: compile-checkable entry(), wedge fallback.

The round-end harness compile-checks ``entry()`` and dry-runs
``dryrun_multichip`` unattended; both must complete even when the
remote TPU transport is wedged (device calls hanging for hours).
"""

import importlib.util
import os
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def graft():
    spec = importlib.util.spec_from_file_location(
        "graft_under_test", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs(graft):
    fn, args = graft.entry()
    theta2, out = jax.jit(fn)(*args)
    assert theta2.shape == args[1].shape
    assert "root_index" in out


def test_entry_falls_back_when_probe_fails(graft, monkeypatch, capsys):
    # configured backend is a (fake) remote transport that never answers:
    # entry() must pin CPU rather than hang the caller's compile check
    monkeypatch.setenv("JAX_PLATFORMS", "wedged_tpu")
    import pmpx.transport as transport

    monkeypatch.setattr(
        transport, "probe_device",
        lambda **k: {"ok": False, "error": "probe did not answer", "probe_s": 1.0},
    )
    fn, args = graft.entry()
    assert "falling back to CPU" in capsys.readouterr().out
    theta2, _ = jax.jit(fn)(*args)
    assert theta2.shape == args[1].shape


def test_entry_skips_probe_on_cpu(graft, monkeypatch):
    calls = []
    import pmpx.transport as transport

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setattr(
        transport, "probe_device",
        lambda **k: calls.append(1),
    )
    graft.entry()
    assert not calls  # no probe subprocess on an explicit-cpu env
