"""Profiling and tracing hooks.

The reference's profiling story is external nvprof captures (six committed
``.nvvp`` files) plus per-iteration ``clock()`` deltas written to txt
(SURVEY.md §5).  Here tracing is first-class: a context manager around any
jitted region produces an XPlane/Chrome trace, and ``device_time_us``
extracts per-op device totals so perf work is measured on-device rather
than through host wall-clock (which on remote transports is quantized by
the dispatch round trip).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import time
from contextlib import contextmanager
from typing import Callable, Dict

import jax

__all__ = ["trace", "device_time_us", "superstep_timer"]


@contextmanager
def trace(log_dir: str):
    """``with pmpx.profiling.trace(dir): ...`` — capture a device trace."""
    with jax.profiler.trace(log_dir):
        yield


def device_time_us(
    log_dir: str, prefix: str = ""
) -> Dict[str, float]:
    """Aggregate device op durations (us) from the newest trace in
    ``log_dir``; optionally filter op names by prefix."""
    files = sorted(
        glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not files:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    agg: Dict[str, float] = collections.defaultdict(float)
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and not e["name"].startswith("$"):
            if prefix and not e["name"].startswith(prefix):
                continue
            agg[e["name"]] += e.get("dur", 0.0)
    return dict(agg)


def superstep_timer(
    run_fn: Callable, *args, iters: int, warmup: bool = True
) -> float:
    """Wall-clock per-iteration time of a scanned run (us), with one warmup
    call so compilation is excluded.  ``run_fn(*args)`` must execute
    ``iters`` supersteps and return device arrays."""
    if warmup:
        jax.block_until_ready(run_fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(run_fn(*args))
    return (time.perf_counter() - t0) / iters * 1e6
