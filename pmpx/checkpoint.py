"""Exact-resume checkpointing of (chain state, RNG key, step).

The reference has no mid-run checkpointing (SURVEY.md §5): warm-start .pkl
loads at start, results saved once at the end, and the only crash
resilience is the CUDA drivers' per-iteration txt streams.  Here a
checkpoint captures everything needed for bitwise-exact resume: the chain
state(s), the *unsplit* PRNG key, and the step counter, serialized as a
self-contained .npz (no heavyweight checkpoint dependency needed for flat
chain state; swap in orbax if sharded pytree state ever needs it).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "adopt_prefix_run",
    "write_protocol_sidecar",
    "save_checkpoint",
    "load_checkpoint",
    "resume_chain",
    "TraceAccumulator",
]


class TraceAccumulator:
    """Accumulate per-chunk trace arrays on disk (``on_chunk`` helper).

    A resumed ``resume_chain`` call only returns the chunks it ran, so
    full-history traces must be persisted per chunk.  Each named array is
    appended to ``<out_dir>/<name>.<key>.npy``, truncated at the chunk's
    start step so a re-run chunk overwrites its own identical records.
    Also records wall-clock per chunk (``chunk_walls``): the first chunk
    includes jit compilation, so steady-state per-step timing is
    ``median(diff(chunk_walls[1:]))`` — see ``steady_s_per_step``.
    """

    def __init__(self, out_dir: str, name: str, keys, fresh: bool = True):
        import time

        self.out_dir = out_dir
        self.keys = tuple(keys)
        self.paths = {
            k: os.path.join(out_dir, f"{name}.{k}.npy") for k in self.keys
        }
        self.chunk_walls = []
        self._t0 = time.time()
        self._time = time.time
        os.makedirs(out_dir, exist_ok=True)
        if fresh:
            for p in self.paths.values():
                if os.path.exists(p):
                    os.remove(p)

    def __call__(self, start: int, recs):
        if not isinstance(recs, (tuple, list)):
            recs = (recs,)
        if len(recs) != len(self.keys):
            raise ValueError(
                f"chunk returned {len(recs)} arrays for keys {self.keys}"
            )
        for k, arr in zip(self.keys, recs):
            arr = np.asarray(arr)
            p = self.paths[k]
            prev = (
                np.load(p) if os.path.exists(p)
                else np.zeros((0,) + arr.shape[1:], arr.dtype)
            )
            if len(prev) < start:
                # a silent pad/truncate here would step-shift the whole
                # trace; the checkpoint and the .npy must agree
                raise RuntimeError(
                    f"{p} holds {len(prev)} records but the resumed "
                    f"chunk starts at step {start} — trace and "
                    "checkpoint are out of sync (deleted .npy, or keys "
                    "changed mid-run?)"
                )
            np.save(p, np.concatenate([prev[:start], arr]))
        self.chunk_walls.append(self._time() - self._t0)

    def load(self, key=None):
        return np.load(self.paths[key or self.keys[0]])

    def steady_s_per_step(self, chunk_steps: int):
        """Per-step wall time excluding the first (compiling) chunk."""
        diffs = np.diff([0.0] + self.chunk_walls)
        if len(diffs) < 2:
            return None
        return float(np.median(diffs[1:]) / chunk_steps)


def write_protocol_sidecar(out_dir: str, stem: str, protocol: dict) -> str:
    """Record the protocol knobs the trace stem does NOT encode.

    ``reference_style_name`` stems carry algo/alpha/steps/model/N only;
    knobs like temper, class_sep, label_noise, seed, or compute_dtype
    change the posterior or the chain without changing the stem.  The
    sidecar (``<stem>.protocol.json``) pins them so ``adopt_prefix_run``
    can refuse to splice two different targets into one trace.
    """
    import json

    path = os.path.join(out_dir, stem + ".protocol.json")
    os.makedirs(out_dir, exist_ok=True)
    with open(path, "w") as f:
        json.dump(protocol, f, indent=1, sort_keys=True)
    return path


def adopt_prefix_run(
    out_dir: str, name_of, num_steps: int, keys=(),
    protocol: Optional[dict] = None,
) -> Optional[int]:
    """Adopt the longest shorter run of the same protocol as a resume seed.

    The paper-protocol trace stems embed ``num_steps``
    (``reference_style_name``: ``..._sample_number_{steps}...``), so
    re-launching an experiment with a *larger* step target would start
    from scratch even though a bitwise-resumable prefix checkpoint sits
    next to it under the old stem.  Given ``name_of(steps) -> stem``,
    this finds the sibling ``.ckpt`` with the largest embedded step
    count < ``num_steps`` whose stem round-trips through ``name_of``
    AND — when ``protocol`` is given — whose ``.protocol.json`` sidecar
    (``write_protocol_sidecar``) matches it exactly, then copies its
    checkpoint plus the given per-chunk trace arrays to the new stem.
    The stem alone pins only algo/alpha/model/N; the sidecar pins the
    rest (temper, data knobs, seed, dtype).  A candidate with NO
    sidecar (a pre-sidecar run) is adopted with a loud warning rather
    than skipped — refusing would silently re-run hours of chip time —
    but any sidecar that disagrees is a hard skip.  Copy, not move: the
    shorter run's artifacts remain valid results in their own right.
    Returns the adopted run's embedded step count, or None if there was
    nothing to adopt (including when the new-stem checkpoint exists).
    """
    import json
    import re
    import shutil

    new_name = name_of(num_steps)
    new_ckpt = os.path.join(out_dir, new_name + ".ckpt")
    if os.path.exists(new_ckpt) or not os.path.isdir(out_dir):
        return None
    best, best_had_sidecar = None, True
    for fn in os.listdir(out_dir):
        if not fn.endswith(".ckpt"):
            continue
        m = re.search(r"sample_number_(\d+)", fn)
        if not m:
            continue
        steps = int(m.group(1))
        if not (steps < num_steps and fn[:-5] == name_of(steps)):
            continue
        had_sidecar = True
        if protocol is not None:
            side = os.path.join(out_dir, fn[:-5] + ".protocol.json")
            if os.path.exists(side):
                with open(side) as f:
                    if json.load(f) != protocol:
                        continue  # a DIFFERENT posterior/chain: never splice
            else:
                had_sidecar = False
        if best is None or steps > best:
            best, best_had_sidecar = steps, had_sidecar
    if best is None:
        return None
    old_name = name_of(best)
    if protocol is not None and not best_had_sidecar:
        print(
            f"WARNING: adopting pre-sidecar prefix run {old_name!r}; its "
            "temper/data/seed/dtype knobs are unverifiable — confirm they "
            "match before trusting the spliced trace",
            flush=True,
        )
    for suffix in [".ckpt"] + [f".{k}.npy" for k in keys]:
        src = os.path.join(out_dir, old_name + suffix)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(out_dir, new_name + suffix))
    if protocol is not None:
        write_protocol_sidecar(out_dir, new_name, protocol)
    return best


def save_checkpoint(
    path: str, theta, key, step: int, extra: Optional[Dict[str, Any]] = None
) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    key_data = jax.random.key_data(key)
    arrays = {
        "theta": np.asarray(theta),
        "key_data": np.asarray(key_data),
        "step": np.asarray(step),
    }
    for k, v in (extra or {}).items():
        arrays[f"extra_{k}"] = np.asarray(v)
    # savez to an open handle: np.savez(path_str) silently appends '.npz',
    # which would break load/resume on the path we return.  Write to a
    # temp file and os.replace: a SIGKILL mid-write must never leave a
    # torn chain.ckpt (crash-anywhere is the whole resume contract)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Tuple[jnp.ndarray, jnp.ndarray, int, dict]:
    z = np.load(path)
    theta = jnp.asarray(z["theta"])
    key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
    step = int(z["step"])
    extra = {
        k[len("extra_"):]: jnp.asarray(v)
        for k, v in z.items()
        if k.startswith("extra_")
    }
    return theta, key, step, extra


def resume_chain(
    superstep,
    path: str,
    total_steps: int,
    collect=None,
    checkpoint_every: Optional[int] = None,
    on_chunk=None,
    bind=None,
    bind_args=(),
):
    """Run a chain to ``total_steps``, resuming from ``path`` if it exists.

    The per-step key is ``fold_in(base_key, step)`` so a resumed run
    reproduces exactly the keys an uninterrupted run would have used.
    ``on_chunk(start_step, recs)``, if given, is called after each chunk
    *before* the checkpoint is written: a crash between the two at worst
    re-runs one chunk, whose deterministic records overwrite identically.
    NOTE: the returned records list covers only the chunks THIS call ran —
    a resumed call starts at the checkpoint step.  Callers that need the
    full-history trace must persist per-chunk via ``on_chunk`` (see
    ``experiments/mnist.py``).

    ``bind``/``bind_args``: thread large arrays (datasets) through the
    chunk runners as jit *arguments* instead of closure constants —
    ``bind`` is a contextmanager (e.g. ``target.bound_data``) entered at
    trace time around tracers of ``bind_args``; closure-embedding a
    full-scale dataset in the serialized HLO is what the remote-compile
    transport rejects.
    Returns (theta, records list).
    """
    import contextlib

    if os.path.exists(path):
        theta, base_key, start, _ = load_checkpoint(path)
    else:
        raise FileNotFoundError(
            f"no checkpoint at {path}; save one with save_checkpoint first"
        )

    recs_all = []
    step = start
    chunk = checkpoint_every or max(total_steps - start, 1)

    def make_runner(n):
        @jax.jit
        def f(start_idx, t, *bargs):
            ctx = (
                bind(*bargs) if bind is not None
                else contextlib.nullcontext()
            )
            with ctx:
                idxs = start_idx + jnp.arange(n, dtype=jnp.uint32)

                def body(state, i):
                    k = jax.random.fold_in(base_key, i)
                    s2, out = superstep(k, state)
                    rec = (
                        collect(s2, out) if collect is not None else out
                    )
                    return s2, rec

                return jax.lax.scan(body, t, idxs)

        return f

    f = make_runner(chunk)
    while step < total_steps:
        n = min(chunk, total_steps - step)
        if n != chunk:
            f = make_runner(n)
        theta, recs = f(jnp.asarray(step, jnp.uint32), theta, *bind_args)
        recs = jax.tree.map(np.asarray, recs)
        recs_all.append(recs)
        if on_chunk is not None:
            on_chunk(step, recs)
        step += n
        save_checkpoint(path, theta, base_key, step)
    return theta, recs_all
