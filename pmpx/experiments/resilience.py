"""Crash resilience end-to-end: kill a live run, resume, prove bitwise identity.

The reference's only crash story is per-iteration txt streams from the
host loop (``conv_mp.cu:283-289``) — a crashed run restarts from zero.
Here a chain killed with SIGKILL mid-chunk resumes from its last
checkpoint and produces a final trace *bitwise identical* to an
uninterrupted run: ``pmpx.checkpoint.resume_chain`` keys every step as
``fold_in(base_key, step)``, per-chunk records stream through the native
``TraceWriter`` (background-thread C++ writer, ``runtime/pmpx_rt.cpp``),
and a re-run chunk overwrites its file with identical bytes.

Both the reference run and the crash-looped run execute in subprocesses
on the same backend, so the comparison is over identical programs.  Two
interruption modes:

* ``kill_mode="sigkill"`` — the parent SIGKILLs the child mid-chunk
  (real crash; default on CPU);
* ``kill_mode="exit"`` — the child exits cleanly after k chunks
  (preemption at a chunk boundary; the safe mode for the axon TPU
  transport, where killing a process mid-device-op wedges the grant).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

CHILD_SRC = r"""
import sys
import jax

platform = sys.argv[1]
if platform != "default":
    jax.config.update("jax_platforms", platform)
# every launch runs the same program: share compiles across processes
jax.config.update("jax_compilation_cache_dir", "/tmp/pmpx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from pmpx.experiments.resilience import child
child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
      int(sys.argv[5]), int(sys.argv[6]), int(sys.argv[7]),
      int(sys.argv[8]), int(sys.argv[9]))
"""


def _build_superstep(n_data: int, depth: int, seed: int):
    import jax

    from pmpx import tree  # noqa: F401
    from pmpx.config import SamplerSpec
    from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg

    x, y = make_synthetic_linreg(jax.random.key(seed), n_data)
    target = BayesLinReg(x, y, temper=1.0 / 2000.0)
    spec = SamplerSpec(
        algo="pmp", N=1, depth=depth, step_size=0.02,
        selection="all_first",
    )
    return spec.build(target)


def child(
    work_dir: str,
    num_steps: int,
    checkpoint_every: int,
    n_data: int,
    depth: int,
    seed: int,
    max_chunks: int = 0,
    throttle_ms: int = 0,
):
    """Run (or resume) the chain, streaming each chunk's root trace to
    ``trace_<start>.bin`` via the native TraceWriter.

    ``max_chunks > 0`` bounds this launch to that many chunks and exits
    cleanly (the preemption story: no signal ever interrupts a device
    op, required on the axon TPU transport).  ``throttle_ms`` sleeps
    after each trace write and *before* the checkpoint save — widening
    the nastiest crash window (records persisted, progress not yet
    committed; a resume must re-run the chunk and overwrite its file
    with identical bytes)."""
    import jax

    from pmpx.checkpoint import (
        load_checkpoint,
        resume_chain,
        save_checkpoint,
    )
    from pmpx.runtime import TraceWriter

    superstep = _build_superstep(n_data, depth, seed)
    ckpt = os.path.join(work_dir, "chain.ckpt")
    if not os.path.exists(ckpt):
        theta0 = np.array([0.0, 0.0, 1.0], np.float32)
        save_checkpoint(ckpt, theta0, jax.random.key(seed), 0)
    if max_chunks > 0:
        _, _, start, _ = load_checkpoint(ckpt)
        num_steps = min(num_steps, start + max_chunks * checkpoint_every)

    def on_chunk(start, recs):
        tw = TraceWriter(
            os.path.join(work_dir, f"trace_{start:09d}.bin"),
            recs.shape[1],
        )
        for row in recs:
            tw.append(row)
        tw.close()
        if throttle_ms:
            time.sleep(throttle_ms / 1000.0)

    resume_chain(
        superstep, ckpt, num_steps,
        collect=lambda th, out: th,
        checkpoint_every=checkpoint_every,
        on_chunk=on_chunk,
    )


def _spawn(work_dir, num_steps, every, n_data, depth, seed, throttle_ms,
           platform, max_chunks=0):
    return subprocess.Popen(
        [
            sys.executable, "-c", CHILD_SRC, platform, work_dir,
            str(num_steps), str(every), str(n_data), str(depth),
            str(seed), str(max_chunks), str(throttle_ms),
        ],
        cwd=os.getcwd(),
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def _ckpt_step(work_dir) -> int:
    path = os.path.join(work_dir, "chain.ckpt")
    if not os.path.exists(path):
        return -1
    try:
        with open(path, "rb") as f:
            z = np.load(f)
            return int(z["step"])
    except Exception:
        return -1  # torn read while the child writes


def _assemble(work_dir) -> np.ndarray:
    from pmpx.runtime import read_trace

    files = sorted(glob.glob(os.path.join(work_dir, "trace_*.bin")))
    return np.concatenate([read_trace(f) for f in files], axis=0)


def run(
    num_steps: int = 3000,
    checkpoint_every: int = 500,
    kills: int = 2,
    n_data: int = 2000,
    depth: int = 5,
    seed: int = 0,
    throttle_ms: int = 0,
    platform: str = "cpu",
    kill_mode: str = "sigkill",  # sigkill | exit
    out_dir: str = "results/resilience",
    scale: str = "smoke",
):
    if scale == "paper":
        num_steps, checkpoint_every, n_data, kills = 1_000_000, 100_000, 100000, 3
    os.makedirs(out_dir, exist_ok=True)
    ref_dir = os.path.join(out_dir, "uninterrupted")
    cut_dir = os.path.join(out_dir, "killed")
    for d in (ref_dir, cut_dir):
        os.makedirs(d, exist_ok=True)
        for f in glob.glob(os.path.join(d, "*")):
            os.remove(f)

    args = (num_steps, checkpoint_every, n_data, depth, seed,
            throttle_ms)

    # reference: one uninterrupted child
    p = _spawn(ref_dir, *args, platform)
    rc = p.wait()
    if rc != 0:
        raise RuntimeError(f"uninterrupted child failed rc={rc}")

    # crash loop: kill mid-chunk (sigkill) or preempt at chunk
    # boundaries (exit), resuming until the chain completes
    kill_log = []
    done_kills = 0
    launches = 0
    while _ckpt_step(cut_dir) < num_steps:
        launches += 1
        if done_kills < kills and kill_mode == "exit":
            # clean preemption: child self-bounds to one chunk, exits 0
            p = _spawn(cut_dir, *args, platform, max_chunks=1)
            rc = p.wait()
            if rc != 0:
                raise RuntimeError(f"bounded child failed rc={rc}")
            done_kills += 1
            kill_log.append(
                {"launch": launches,
                 "clean_exit_at_step": _ckpt_step(cut_dir)}
            )
            continue
        p = _spawn(cut_dir, *args, platform)
        if done_kills < kills:
            # wait for progress beyond the current checkpoint, then
            # SIGKILL mid-next-chunk (a real crash)
            base = max(_ckpt_step(cut_dir), 0)
            deadline = time.time() + 300
            while (
                _ckpt_step(cut_dir) <= base
                and p.poll() is None
                and time.time() < deadline
            ):
                time.sleep(0.02)
            if p.poll() is None:
                time.sleep(0.05)  # land inside the next chunk
                p.kill()
                p.wait()
                at = _ckpt_step(cut_dir)
                if at < num_steps:  # a genuine mid-run crash
                    done_kills += 1
                    kill_log.append(
                        {"launch": launches, "sigkill_at_step": at}
                    )
                continue
            rc = p.wait()
            if rc != 0:
                raise RuntimeError(f"child crashed on its own rc={rc}")
        else:
            rc = p.wait()
            if rc != 0:
                raise RuntimeError(f"resume child failed rc={rc}")

    ref = _assemble(ref_dir)
    cut = _assemble(cut_dir)
    identical = ref.shape == cut.shape and bool(
        np.array_equal(ref, cut)
    )
    summary = {
        "num_steps": num_steps,
        "checkpoint_every": checkpoint_every,
        "platform": platform,
        "kill_mode": kill_mode,
        "kills": done_kills,
        "launches": launches,
        "kill_log": kill_log,
        "rows": int(cut.shape[0]),
        "bitwise_identical": identical,
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    if not identical:
        raise AssertionError(
            f"resumed trace differs from uninterrupted run: {summary}"
        )
    return summary
