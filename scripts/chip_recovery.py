"""Resume-on-recovery: manual entry point for an already-stopped queue.

During a transport outage the right move is to stop all grant
competition (SIGSTOP the queue driver, kill the in-flight stage) and
wait.  ``queue_watchdog`` does this automatically after a stall kill;
this script is the manual path when an operator has already quiesced
the driver by hand — it simply runs the watchdog's recover() loop:
bounded probe every 10 min, SIGCONT the driver once the chip answers,
exit.

Usage: nohup python scripts/chip_recovery.py <driver_pid> > rec.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from queue_watchdog import log, recover  # noqa: E402


def driver_state(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().split(") ")[1].split()[0]
    except OSError:
        return "gone"


def main() -> None:
    driver = int(sys.argv[1])
    if driver_state(driver) == "gone":
        log("driver exited; nothing to resume")
        return
    recover(driver)


if __name__ == "__main__":
    main()
