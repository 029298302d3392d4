"""Sequential queue driver for the reference-scale (paper-protocol) runs.

The reference's committed results are hours-long single-GPU jobs (CIFAR
50k supersteps, BNN 30k, MNIST CNN 250k / LSTM 1M).  On the shared TPU
they must run (a) one at a time — concurrent processes time-slice through
the transport and pollute each other's steady-state timing — and (b) as
checkpoint-resumable chunked subprocesses, because a wedged transport or
worker crash must cost one chunk, not the run.

Stages live in ``scripts/paper_queue.json`` and are re-read after every
stage, so the queue can be re-prioritized mid-flight without touching a
running job.  A stage is one ``python -m pmpx.cli run ...`` subprocess
(cwd must be /root/repo: the TPU plugin registers only from there); on
nonzero exit it is retried with a cool-down (every paper experiment
passes ``--resume true`` so a retry continues from its checkpoint).
Completed stages leave a ``<name>.done`` marker and are skipped on
re-entry, so re-running this script is idempotent.

A wedged transport can also hang a stage *without* exiting (observed:
all threads in futex_do_wait for 70+ min while the chunk checkpoint
stopped advancing), so each stage runs under a stall monitor: if the
stage writes nothing (its log or its ``--out-dir``) for ``STALL_S``, it
is SIGTERMed and retried like any other failure.  The threshold leaves
room for the axon remote-compile helper (3-25 min of legitimate
file-silence); healthy chunked runs checkpoint every <=60 s of device
time.  ``scripts/queue_watchdog.py`` applies the same rule externally
to an already-running driver.

Usage: nohup python scripts/run_paper.py [queue.json] > qlog 2>&1 &
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_DIR = os.path.join(REPO, "artifacts", "paper_queue")
MAX_ATTEMPTS = 4
COOLDOWN_S = 150  # a killed axon grant wedges the chip for minutes
STALL_S = 35 * 60  # no-file-activity threshold before a stage is killed
MONITOR_POLL_S = 30
PROBE_TIMEOUT_S = 150
RECOVERY_POLL_S = 600
_PROBE_CODE = (
    "import jax, jax.numpy as jnp; "
    "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready(); "
    "print('CHIP_OK', jax.default_backend())"
)


def chip_answers(timeout_s: float = PROBE_TIMEOUT_S) -> bool:
    """Bounded tiny-op probe in a throwaway subprocess (stdlib-only
    sibling of ``pmpx.transport.probe_device``): output to a temp file
    (a pipe could block the post-kill drain if a grandchild inherits
    it), whole process group killed on timeout."""
    with tempfile.TemporaryFile("w+") as fout:
        proc = subprocess.Popen(
            [sys.executable, "-c", _PROBE_CODE], cwd=REPO,
            stdout=fout, stderr=subprocess.DEVNULL,
            start_new_session=True,
        )
        try:
            proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                pass
            proc.wait()
            return False
        fout.seek(0)
        return "CHIP_OK" in fout.read()


def wait_for_chip() -> None:
    """Block until the transport answers a bounded probe.

    Retrying a stage into a wedged transport is worse than useless:
    fresh backend inits die after ~25 min with UNAVAILABLE and the
    competing processes appear to keep the grant from recovering — so
    after any failed attempt the queue holds here (the chip is idle:
    the failed stage child is gone) instead of burning MAX_ATTEMPTS.
    """
    if chip_answers():
        return
    log("transport not answering; holding the queue until it recovers")
    while not chip_answers():
        time.sleep(RECOVERY_POLL_S)
    log("transport recovered")


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def load_stages(path: str):
    with open(path) as f:
        return json.load(f)["stages"]


def _out_dir(argv: list) -> str | None:
    for i, a in enumerate(argv):
        if a == "--out-dir" and i + 1 < len(argv):
            return os.path.join(REPO, argv[i + 1])
    return None


def _latest_mtime(paths: list) -> float:
    best = 0.0
    for p in paths:
        if not p:
            continue
        if os.path.isdir(p):
            for name in os.listdir(p):
                try:
                    best = max(best, os.path.getmtime(os.path.join(p, name)))
                except OSError:
                    pass
        elif os.path.exists(p):
            best = max(best, os.path.getmtime(p))
    return best


def _wait_with_stall_monitor(proc, watched: list) -> int:
    """Poll the stage child; SIGTERM it after STALL_S of file silence."""
    started = time.time()
    while True:
        rc = proc.poll()
        if rc is not None:
            return rc
        quiet = time.time() - max(started, _latest_mtime(watched))
        if quiet > STALL_S:
            log(f"stage pid={proc.pid} silent {quiet / 60:.0f} min — "
                f"SIGTERM (wedged transport)")
            proc.send_signal(signal.SIGTERM)
            try:
                return proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
                return proc.wait()
        time.sleep(MONITOR_POLL_S)


def _commit_stage_artifacts(stage: dict, marker: str, logpath: str) -> None:
    """Commit a drained stage's artifacts at the stage boundary so a
    round can never end with finished results sitting uncommitted
    (VERDICT r3 'round-end hygiene').  Only the stage's own paths are
    staged — never `git add -A`, which could sweep in a concurrent
    stage's half-written traces or in-flight source edits."""
    paths = [marker, logpath]
    out = _out_dir(stage.get("argv", stage.get("cmd", [])))
    if out:
        paths.append(out)
    # summarize-style cmd stages rewrite summary dirs given as plain args
    for a in stage.get("cmd", []):
        cand = os.path.join(REPO, a)
        if a.startswith("artifacts") and os.path.exists(cand):
            paths.append(cand)
    try:
        subprocess.run(["git", "add", "--"] + paths, cwd=REPO,
                       check=True, capture_output=True, timeout=120)
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--"] + paths, cwd=REPO,
            capture_output=True, timeout=120,
        ).stdout.strip()
        if not dirty:
            return  # nothing new under the stage's paths
        # pathspec'd commit: a builder staging unrelated files
        # concurrently must not get them swept into this commit
        subprocess.run(
            ["git", "commit", "-q", "-m",
             f"Queue: {stage['name']} artifacts (rc=0)\n\n"
             f"No-Verification-Needed: artifacts/data-only commit",
             "--"] + paths,
            cwd=REPO, check=True, capture_output=True, timeout=120,
        )
        log(f"committed {stage['name']} artifacts")
    except (subprocess.SubprocessError, OSError) as e:
        # committing is best-effort hygiene; never fail the stage on it
        log(f"stage-commit skipped for {stage['name']}: {e}")


def run_stage(stage: dict) -> bool:
    name = stage["name"]
    marker = os.path.join(STATE_DIR, f"{name}.done")
    if os.path.exists(marker):
        log(f"skip {name} (done)")
        return True
    if stage.get("skip"):
        log(f"skip {name} (marked skip)")
        return True
    logpath = os.path.join(STATE_DIR, f"{name}.log")
    if "cmd" in stage:
        # raw command stage (e.g. the terminal summarize step) — argv
        # is passed to the interpreter directly, not to `pmpx.cli run`
        cmd = [sys.executable] + stage["cmd"]
    else:
        cmd = [sys.executable, "-m", "pmpx.cli", "run"] + stage["argv"]
    wait_for_chip()  # don't launch into a wedge a previous stage hit
    for attempt in range(1, MAX_ATTEMPTS + 1):
        log(f"start {name} attempt {attempt}: {' '.join(cmd)}")
        t0 = time.time()
        with open(logpath, "a") as lf:
            lf.write(f"\n=== attempt {attempt} {time.ctime()} ===\n")
            lf.flush()
            proc = subprocess.Popen(
                cmd, cwd=REPO, stdout=lf, stderr=subprocess.STDOUT
            )
            rc = _wait_with_stall_monitor(
                proc, [logpath, _out_dir(stage.get("argv", [])) or ""]
            )
        wall = time.time() - t0
        log(f"{name} attempt {attempt}: rc={rc} wall={wall:.0f}s")
        if rc == 0:
            with open(marker, "w") as f:
                json.dump({"wall_s": wall, "attempts": attempt}, f)
            _commit_stage_artifacts(stage, marker, logpath)
            stale = os.path.join(STATE_DIR, f"{name}.failed")
            if os.path.exists(stale):
                os.remove(stale)
            return True
        if attempt < MAX_ATTEMPTS:
            time.sleep(COOLDOWN_S)
            wait_for_chip()
    log(f"FAILED {name} after {MAX_ATTEMPTS} attempts")
    with open(os.path.join(STATE_DIR, f"{name}.failed"), "w") as f:
        json.dump(
            {"argv": stage.get("argv", stage.get("cmd")),
             "at": time.time()}, f)
    return False


def main():
    queue_path = (
        sys.argv[1] if len(sys.argv) > 1
        else os.path.join(REPO, "scripts", "paper_queue.json")
    )
    os.makedirs(STATE_DIR, exist_ok=True)
    done: set = set()
    failed: dict = {}  # name -> the argv that exhausted its attempts
    stages = load_stages(queue_path)
    while True:
        try:
            stages = load_stages(queue_path)
        except (json.JSONDecodeError, OSError) as e:
            # the queue is advertised live-editable: a mid-write or
            # malformed JSON must not kill hours of pending TPU stages —
            # keep the last-good stage list and retry the read later
            log(f"queue reload failed ({e}); keeping last-good list")
        # a failed stage is skipped only while its argv is unchanged —
        # fixing the argv in the live-edited JSON re-queues it (the
        # whole point of live editing); a .failed marker records why
        pending = [
            s for s in stages
            if s["name"] not in done
            and failed.get(s["name"]) != s.get("argv", s.get("cmd"))
        ]
        if not pending:
            break
        stage = pending[0]
        if run_stage(stage):  # failures are logged; don't block the queue
            done.add(stage["name"])
            failed.pop(stage["name"], None)
        else:
            failed[stage["name"]] = stage.get("argv", stage.get("cmd"))
    if failed:
        log(f"queue drained with FAILED stages: {sorted(failed)}")
        sys.exit(1)
    log("queue drained")


if __name__ == "__main__":
    main()
