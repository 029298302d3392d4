"""Resume-on-recovery daemon for axon chip outages.

During a transport wedge (device calls hang forever; fresh backend
inits die after ~25 min with UNAVAILABLE) the right move is to stop all
grant competition: SIGSTOP the queue driver, kill the in-flight stage,
and wait.  This daemon owns the waiting: every POLL_S it runs a tiny
bounded device op in a subprocess; when one finally succeeds it
SIGCONTs the (stopped) queue driver so the paper queue resumes, and
exits.  Probes are short-bounded so a still-wedged chip only sees a few
seconds of competition per poll.

Usage: nohup python scripts/chip_recovery.py <driver_pid> > rec.log 2>&1 &
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

POLL_S = 600
PROBE_TIMEOUT_S = 150
PROBE = (
    "import jax, jax.numpy as jnp; "
    "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready(); "
    "print('CHIP_OK', jax.default_backend())"
)


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def driver_state(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().split(") ")[1].split()[0]
    except OSError:
        return "gone"


def main() -> None:
    driver = int(sys.argv[1])
    log(f"probing chip every {POLL_S}s; will SIGCONT driver {driver}")
    while True:
        st = driver_state(driver)
        if st == "gone":
            log("driver exited; nothing to resume")
            return
        try:
            out = subprocess.run(
                [sys.executable, "-c", PROBE],
                capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            ok = "CHIP_OK" in out.stdout
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            log(f"chip recovered ({out.stdout.strip()})")
            if st == "T":
                os.kill(driver, signal.SIGCONT)
                log(f"SIGCONT sent to driver {driver}")
            else:
                log(f"driver state {st}; no SIGCONT needed")
            return
        log("chip still wedged")
        time.sleep(POLL_S)


if __name__ == "__main__":
    main()
