"""Shared experiment plumbing."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.samplers.base import run_chain

__all__ = ["collect_samples", "maybe_plot", "as_tuple"]


def as_tuple(v):
    """Accept scalars for tuple-valued experiment knobs (the CLI parses a
    single `--Ps 4` as an int, `--Ps 4,16` as a tuple)."""
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return (v,)


def collect_samples(superstep, key, theta0, num_steps, burn_frac=0.2):
    """jit-run a chain and return flattened post-burn-in samples (n, d)."""
    _, recs = jax.jit(
        lambda k, t: run_chain(superstep, k, t, num_steps)
    )(key, theta0)
    s = np.asarray(recs["samples"])
    s = s.reshape(-1, s.shape[-1])
    return s[int(burn_frac * len(s)) :]


def maybe_plot(fn):
    """Run a matplotlib plotting closure if matplotlib is importable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    return fn(plt)
