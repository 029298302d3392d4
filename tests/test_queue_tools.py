"""Unit tests for the paper-queue resilience tooling.

The serial queue (``scripts/run_paper.py``) must survive the transport
failure actually observed on this hardware: a device call that never
returns, leaving the stage child alive-but-silent forever.  These tests
exercise the host-side pieces (stall monitor, watchdog helpers,
recovery-daemon state probe) with plain subprocesses — no TPU, no jax.
"""

import importlib.util
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, rel)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def run_paper():
    return _load("rp_under_test", "scripts/run_paper.py")


@pytest.fixture(scope="module")
def watchdog():
    return _load("wd_under_test", "scripts/queue_watchdog.py")


@pytest.fixture(scope="module")
def recovery():
    return _load("rec_under_test", "scripts/chip_recovery.py")


def test_stall_monitor_kills_silent_child(run_paper, monkeypatch):
    monkeypatch.setattr(run_paper, "STALL_S", 1)
    monkeypatch.setattr(run_paper, "MONITOR_POLL_S", 1)
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(600)"])
    t0 = time.time()
    rc = run_paper._wait_with_stall_monitor(proc, ["/nonexistent"])
    assert rc == -15  # SIGTERM
    assert time.time() - t0 < 120


def test_stall_monitor_passes_through_healthy_exit(run_paper):
    proc = subprocess.Popen([sys.executable, "-c", "raise SystemExit(7)"])
    assert run_paper._wait_with_stall_monitor(proc, ["/nonexistent"]) == 7


def test_stall_monitor_respects_file_activity(run_paper, monkeypatch, tmp_path):
    # child touches a watched file continuously -> never killed, exits 0
    monkeypatch.setattr(run_paper, "STALL_S", 6)
    monkeypatch.setattr(run_paper, "MONITOR_POLL_S", 1)
    beat = tmp_path / "heartbeat"
    beat.write_text("start")  # cover the child's interpreter startup
    code = (
        "import pathlib, time\n"
        f"p = pathlib.Path({str(beat)!r})\n"
        "for _ in range(16):\n"
        "    p.write_text('x'); time.sleep(0.5)\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", code])
    assert run_paper._wait_with_stall_monitor(proc, [str(beat)]) == 0


def test_out_dir_extraction(run_paper):
    argv = ["cifar_hmc", "--algo", "mp_hmc", "--out-dir", "artifacts/x"]
    assert run_paper._out_dir(argv).endswith("artifacts/x")
    assert run_paper._out_dir(["a", "--out-dir"]) is None
    assert run_paper._out_dir([]) is None


def test_latest_mtime_handles_missing_and_dirs(run_paper, tmp_path):
    f = tmp_path / "a.log"
    f.write_text("x")
    got = run_paper._latest_mtime([str(tmp_path), "/nonexistent", ""])
    assert abs(got - f.stat().st_mtime) < 1e-6
    assert run_paper._latest_mtime(["/nonexistent"]) == 0.0


def test_watchdog_child_discovery_and_out_dir(watchdog):
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)"])
    try:
        # /proc/<pid>/task/*/children is only guaranteed-accurate for
        # stopped children, and /proc/<pid>/cmdline reads empty during
        # the exec window; retry briefly to absorb both
        argv = []
        for _ in range(40):
            kids = watchdog.children_of(os.getpid())
            argv = watchdog.cmdline(proc.pid)
            if proc.pid in kids and argv and argv[0]:
                break
            time.sleep(0.25)
        assert proc.pid in kids
        assert argv[0] == sys.executable
    finally:
        proc.terminate()
        proc.wait()
    assert watchdog.out_dir_of(["--out-dir", "artifacts/y"]).endswith(
        "artifacts/y"
    )


def test_chip_answers_bounded_and_shared(run_paper, watchdog, monkeypatch):
    # single implementation: the watchdog aliases the probe from the
    # run_paper module it imported (the fixture loads its own copy of
    # run_paper under a different name, so compare within the watchdog)
    assert watchdog.chip_answers is watchdog.run_paper.chip_answers
    monkeypatch.setattr(run_paper, "_PROBE_CODE", "print('CHIP_OK cpu')")
    assert run_paper.chip_answers(timeout_s=30)
    monkeypatch.setattr(
        run_paper, "_PROBE_CODE", "import time; time.sleep(60)"
    )
    t0 = time.time()
    assert not run_paper.chip_answers(timeout_s=2)
    assert time.time() - t0 < 30


def test_wait_for_chip_returns_fast_when_healthy(run_paper, monkeypatch):
    monkeypatch.setattr(run_paper, "_PROBE_CODE", "print('CHIP_OK cpu')")
    t0 = time.time()
    run_paper.wait_for_chip()
    assert time.time() - t0 < 30


def test_stage_log_discovery_via_stdout_fd(watchdog, tmp_path):
    logp = tmp_path / "stage.log"
    with open(logp, "w") as lf:
        proc = subprocess.Popen(
            [sys.executable, "-c", "import time; time.sleep(30)"],
            stdout=lf,
        )
    try:
        for _ in range(40):
            got = watchdog.stage_log_of(proc.pid)
            if got == str(logp):
                break
            time.sleep(0.25)
        assert got == str(logp)
    finally:
        proc.terminate()
        proc.wait()


def test_watchdog_recover_quiesces_then_resumes(watchdog, monkeypatch):
    # fake driver: recover() must SIGSTOP it, poll the chip, and SIGCONT
    # it once a probe succeeds
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    answers = iter([False, True])
    monkeypatch.setattr(watchdog, "chip_answers", lambda: next(answers))
    monkeypatch.setattr(watchdog, "POLL_RECOVERY_S", 0.1)
    try:
        watchdog.recover(proc.pid)
        time.sleep(0.3)
        with open(f"/proc/{proc.pid}/stat") as f:
            state = f.read().split(") ")[1].split()[0]
        assert state != "T"  # resumed, not left stopped
    finally:
        proc.terminate()
        proc.wait()


def test_recovery_driver_state(recovery):
    proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)"])
    try:
        assert recovery.driver_state(proc.pid) in ("S", "R")
        proc.send_signal(19)  # SIGSTOP
        time.sleep(0.2)
        assert recovery.driver_state(proc.pid) == "T"
        proc.send_signal(18)  # SIGCONT
    finally:
        proc.terminate()
        proc.wait()
    assert recovery.driver_state(proc.pid) == "gone"


def test_failed_stage_requeued_only_on_argv_edit(run_paper, monkeypatch,
                                                 tmp_path):
    """A stage that exhausts its attempts is skipped while its argv is
    unchanged, re-queued when the live-edited JSON fixes the argv, and
    the driver exits nonzero if anything is still failed at drain."""
    import json

    qp = tmp_path / "q.json"
    stage = {"name": "s1", "argv": ["exp", "--broken", "1"]}
    qp.write_text(json.dumps({"stages": [stage]}))
    monkeypatch.setattr(run_paper, "STATE_DIR", str(tmp_path))
    monkeypatch.setattr(run_paper.sys, "argv", ["run_paper.py", str(qp)])

    calls = []

    def fake_run_stage(s):
        calls.append(list(s["argv"]))
        if "--broken" in s["argv"]:
            # what the real run_stage does after MAX_ATTEMPTS
            with open(os.path.join(str(tmp_path), f"{s['name']}.failed"),
                      "w") as f:
                json.dump({"argv": s["argv"]}, f)
            return False
        return True

    monkeypatch.setattr(run_paper, "run_stage", fake_run_stage)
    with pytest.raises(SystemExit) as e:
        run_paper.main()
    assert e.value.code == 1
    assert calls == [["exp", "--broken", "1"]]  # failed once, then skipped
    assert os.path.exists(tmp_path / "s1.failed")

    # operator fixes the argv in the live JSON: the stage runs again
    calls.clear()
    fixed = {"name": "s1", "argv": ["exp", "--fixed", "1"]}
    qp.write_text(json.dumps({"stages": [fixed]}))
    run_paper.main()  # drains cleanly now
    assert calls == [["exp", "--fixed", "1"]]


def test_stage_boundary_commit_is_scoped(run_paper, monkeypatch, tmp_path):
    """A drained stage's artifacts are committed at the boundary, and
    the pathspec'd commit must NOT sweep in unrelated files a builder
    staged concurrently (round-end hygiene, VERDICT r3 weak #5)."""
    import json

    def git(*args):
        return subprocess.run(["git", *args], cwd=tmp_path, check=True,
                              capture_output=True, text=True).stdout

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")
    (tmp_path / "seed").write_text("s")
    git("add", "seed")
    git("commit", "-q", "-m", "seed")

    out = tmp_path / "artifacts" / "x"
    out.mkdir(parents=True)
    (out / "trace.npy").write_text("data")
    marker = tmp_path / "s1.done"
    marker.write_text("{}")
    logp = tmp_path / "s1.log"
    logp.write_text("log")
    # a concurrently-staged unrelated file must stay out of the commit
    (tmp_path / "unrelated.py").write_text("x = 1")
    git("add", "unrelated.py")

    monkeypatch.setattr(run_paper, "REPO", str(tmp_path))
    stage = {"name": "s1", "argv": ["exp", "--out-dir", "artifacts/x"]}
    run_paper._commit_stage_artifacts(stage, str(marker), str(logp))

    assert "Queue: s1 artifacts" in git("log", "-1", "--format=%s")
    shown = git("show", "--name-only", "--format=", "HEAD").split()
    assert sorted(shown) == ["artifacts/x/trace.npy", "s1.done", "s1.log"]
    # unrelated.py is still only staged, not committed
    assert "unrelated.py" in git("diff", "--cached", "--name-only")

    # idempotent: nothing new -> no empty commit
    n_before = git("rev-list", "--count", "HEAD").strip()
    run_paper._commit_stage_artifacts(stage, str(marker), str(logp))
    assert git("rev-list", "--count", "HEAD").strip() == n_before


def test_cmd_stages_drain_through_main(run_paper, monkeypatch, tmp_path):
    """Raw-``cmd`` stages (summarize etc.) have no ``argv`` key; the
    pending filter and failure bookkeeping in ``main()`` must handle
    them (regression: KeyError 'argv' crashed the r4 driver the first
    time a queue mixing argv and cmd stages hit the selection loop)."""
    import json

    qp = tmp_path / "q.json"
    qp.write_text(json.dumps({"stages": [
        {"name": "exp1", "argv": ["exp", "--x", "1"]},
        {"name": "sum1", "cmd": ["scripts/summarize_paper.py", "all"]},
    ]}))
    monkeypatch.setattr(run_paper, "STATE_DIR", str(tmp_path))
    monkeypatch.setattr(run_paper.sys, "argv", ["run_paper.py", str(qp)])

    ran = []
    monkeypatch.setattr(
        run_paper, "run_stage", lambda s: ran.append(s["name"]) or True
    )
    run_paper.main()
    assert ran == ["exp1", "sum1"]

    # a FAILED cmd stage is skipped while unchanged, re-queued on edit
    ran.clear()
    monkeypatch.setattr(
        run_paper, "run_stage",
        lambda s: ran.append(s["name"]) or s["name"] != "sum1",
    )
    with pytest.raises(SystemExit):
        run_paper.main()
    assert ran == ["exp1", "sum1"]  # each attempted exactly once
