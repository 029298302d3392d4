"""Wedge watchdog + outage recovery for the paper-protocol queue.

The axon TPU transport occasionally wedges: a device call never returns,
the stage child sits at ~0% CPU on a futex forever, and the sequential
queue (scripts/run_paper.py) blocks behind it (observed: CIFAR MP stage
hung 70+ min with all threads in futex_do_wait).  Retrying immediately
makes it worse — fresh backend inits die after ~25 min with UNAVAILABLE,
and the wedge only clears while NO process competes for the grant.

So the watchdog runs the full recovery protocol, not just the kill:

1. watch: a stage child whose artifacts (its ``--out-dir``) and stage
   logs have all been silent for longer than ``STALL_S`` gets SIGTERMed
   by exact PID.  The threshold is generous (35 min) because the axon
   remote-compile helper can legitimately take 3-25 min with no file
   activity; healthy chunked runs checkpoint every <= 60 s device time.
2. quiesce: the queue driver itself is SIGSTOPped so its retry/cooldown
   loop cannot re-enter the wedge.
3. recover: probe the chip every ``POLL_RECOVERY_S`` with a
   short-bounded tiny op in a subprocess; when one succeeds, SIGCONT
   the driver (its in-flight ``subprocess`` wait returns the kill rc,
   the stage is retried with ``--resume``) and go back to watching.

Usage: nohup python scripts/queue_watchdog.py <driver_pid> > wd.log 2>&1 &
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_DIR = os.path.join(REPO, "artifacts", "paper_queue")
STALL_S = 35 * 60
POLL_S = 60
POLL_RECOVERY_S = 600
PROBE_TIMEOUT_S = 150
PROBE = (
    "import jax, jax.numpy as jnp; "
    "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready(); "
    "print('CHIP_OK', jax.default_backend())"
)


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def children_of(pid: int) -> list[int]:
    kids: list[int] = []
    task_dir = f"/proc/{pid}/task"
    try:
        for tid in os.listdir(task_dir):
            with open(f"{task_dir}/{tid}/children") as f:
                kids += [int(c) for c in f.read().split()]
    except OSError:
        pass
    return kids


def cmdline(pid: int) -> list[str]:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().decode(errors="replace").split("\0")
    except OSError:
        return []


def out_dir_of(argv: list[str]) -> str | None:
    for i, a in enumerate(argv):
        if a == "--out-dir" and i + 1 < len(argv):
            return os.path.join(REPO, argv[i + 1])
    return None


def latest_mtime(paths: list[str]) -> float:
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


def start_time(pid: int) -> float:
    try:
        return os.path.getmtime(f"/proc/{pid}")
    except OSError:
        return time.time()


def chip_answers() -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE], cwd=REPO,
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
        )
        return "CHIP_OK" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def recover(driver: int) -> None:
    """Quiesce the driver, probe until the chip answers, resume."""
    try:
        os.kill(driver, signal.SIGSTOP)
        log(f"driver {driver} SIGSTOPped for quiet recovery")
    except OSError as e:
        log(f"SIGSTOP failed: {e}")
        return
    while os.path.exists(f"/proc/{driver}"):
        if chip_answers():
            log("chip recovered")
            try:
                os.kill(driver, signal.SIGCONT)
                log(f"driver {driver} SIGCONTed")
            except OSError as e:
                log(f"SIGCONT failed: {e}")
            return
        log("chip still wedged")
        time.sleep(POLL_RECOVERY_S)


def main() -> None:
    driver = int(sys.argv[1])
    log(f"watching queue driver pid={driver}, stall threshold "
        f"{STALL_S / 60:.0f} min")
    while os.path.exists(f"/proc/{driver}"):
        for kid in children_of(driver):
            argv = cmdline(kid)
            if "pmpx.cli" not in " ".join(argv):
                continue
            logs = [os.path.join(STATE_DIR, f)
                    for f in os.listdir(STATE_DIR) if f.endswith(".log")]
            watched = [out_dir_of(argv) or ""] + logs
            alive_since = max(start_time(kid), latest_mtime(watched))
            silent = time.time() - alive_since
            if silent > STALL_S:
                log(f"stage pid={kid} silent {silent / 60:.0f} min — "
                    f"SIGTERM ({' '.join(argv[-6:])})")
                try:
                    os.kill(kid, signal.SIGTERM)
                except OSError as e:
                    log(f"kill failed: {e}")
                recover(driver)
        time.sleep(POLL_S)
    log("driver exited; watchdog done")


if __name__ == "__main__":
    main()
