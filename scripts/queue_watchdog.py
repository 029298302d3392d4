"""Wedge watchdog for the paper-protocol queue.

The axon TPU transport occasionally wedges: a device call never returns,
the stage child sits at ~0% CPU on a futex forever, and the sequential
queue (scripts/run_paper.py) blocks behind it (observed: CIFAR MP stage
hung 70+ min with all threads in futex_do_wait).  The queue's recovery
path — nonzero exit, cooldown, retry with ``--resume`` — only triggers
if the child *exits*, so this watchdog supplies the exit.

Rule: a stage child whose artifacts (its ``--out-dir``) and stage log
have all been silent for longer than ``STALL_S`` gets SIGTERMed, by
exact PID.  The threshold is generous (default 35 min) because the axon
remote-compile helper can legitimately take 3-25 min with no file
activity; chunked paper runs checkpoint every <=60 s of device time, so
a healthy post-compile run writes at least every few minutes.

Usage: nohup python scripts/queue_watchdog.py <driver_pid> > wd.log 2>&1 &
"""

from __future__ import annotations

import os
import signal
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_DIR = os.path.join(REPO, "artifacts", "paper_queue")
STALL_S = 35 * 60
POLL_S = 60


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


def main() -> None:
    driver = int(sys.argv[1])
    print(f"watching queue driver pid={driver}, stall threshold "
          f"{STALL_S / 60:.0f} min", flush=True)
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
                print(f"[{time.strftime('%H:%M:%S')}] stage pid={kid} "
                      f"silent {silent / 60:.0f} min — SIGTERM "
                      f"({' '.join(argv[-6:])})", flush=True)
                try:
                    os.kill(kid, signal.SIGTERM)
                except OSError as e:
                    print(f"kill failed: {e}", flush=True)
        time.sleep(POLL_S)
    print("driver exited; watchdog done", flush=True)


if __name__ == "__main__":
    main()
