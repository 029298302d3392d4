"""Wedge watchdog + outage recovery for the paper-protocol queue.

The axon TPU transport occasionally wedges: a device call never returns,
the stage child sits at ~0% CPU on a futex forever, and the sequential
queue (scripts/run_paper.py) blocks behind it (observed: CIFAR MP stage
hung 70+ min with all threads in futex_do_wait).  Retrying immediately
makes it worse — fresh backend inits die after ~25 min with UNAVAILABLE,
and the wedge only clears while NO process competes for the grant.

This external watchdog backstops a driver that predates (or lost) its
internal stall monitor.  Protocol:

1. watch: a stage child whose artifacts (its ``--out-dir``) and its own
   stage log (found via the child's stdout fd — NOT every log in the
   state dir, which other daemons append to) have been silent longer
   than ``run_paper.STALL_S`` gets SIGTERMed by exact PID.  The
   threshold is generous (35 min) because the axon remote-compile
   helper can legitimately take 3-25 min with no file activity; healthy
   chunked runs checkpoint every <= 60 s device time.
2. quiesce: the queue driver is SIGSTOPped so its retry/cooldown loop
   cannot re-enter the wedge.
3. recover: probe the chip every ``POLL_RECOVERY_S`` with the shared
   bounded probe; when one succeeds, SIGCONT the driver (its in-flight
   wait returns the kill rc, the stage retries with ``--resume``) and
   go back to watching.

Shares ``chip_answers`` / ``_out_dir`` / ``_latest_mtime`` with the
driver (single implementation in run_paper.py).

Usage: nohup python scripts/queue_watchdog.py <driver_pid> > wd.log 2>&1 &
"""

from __future__ import annotations

import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import run_paper  # noqa: E402  (shared stdlib helpers; no side effects)

POLL_S = 60
POLL_RECOVERY_S = 600


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


def stage_log_of(pid: int) -> str | None:
    """The stage's own log file = wherever the child's stdout points."""
    try:
        target = os.readlink(f"/proc/{pid}/fd/1")
    except OSError:
        return None
    return target if target.startswith("/") else None


# single implementations live in run_paper (the driver)
out_dir_of = run_paper._out_dir
latest_mtime = run_paper._latest_mtime
chip_answers = run_paper.chip_answers


def start_time(pid: int) -> float:
    try:
        return os.path.getmtime(f"/proc/{pid}")
    except OSError:
        return time.time()


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
        f"{run_paper.STALL_S / 60:.0f} min")
    while os.path.exists(f"/proc/{driver}"):
        for kid in children_of(driver):
            argv = cmdline(kid)
            if "pmpx.cli" not in " ".join(argv):
                continue
            watched = [out_dir_of(argv) or "", stage_log_of(kid) or ""]
            alive_since = max(start_time(kid), latest_mtime(watched))
            silent = time.time() - alive_since
            if silent > run_paper.STALL_S:
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
