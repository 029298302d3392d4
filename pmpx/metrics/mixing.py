"""Mixing-quality metrics: MSJD, acceptance rate, skewness.

* MSJD — mean squared jump distance, the quantity behind the reference's
  ``msjd_compare.pdf`` (protocol: 1M-step dumps from ``ess_per_s_*.cu``;
  computation absent from the reference repo).
* skewness — the reference's unbiasedness-vs-iterations diagnostic
  (``simple_net/skewness/skewness.ipynb`` cell 1: per-chain standardized
  third moment of the chain mean estimates).
* acceptance — fraction of supersteps whose selected root differs from the
  incumbent (SP accept rate analog for tree samplers).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["msjd", "skewness", "move_rate"]


def msjd(X: jnp.ndarray) -> jnp.ndarray:
    """Mean squared jump distance of an (n, d) chain."""
    d = X[1:] - X[:-1]
    return jnp.mean(jnp.sum(d * d, axis=-1))


def skewness(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Standardized third central moment (biased, like the notebook's)."""
    mu = jnp.mean(x, axis=axis, keepdims=True)
    s = jnp.std(x, axis=axis, keepdims=True)
    z = (x - mu) / jnp.maximum(s, 1e-30)
    return jnp.mean(z**3, axis=axis)


def move_rate(roots: jnp.ndarray) -> jnp.ndarray:
    """Fraction of steps where the chain actually moved.

    ``roots``: (steps, d) chain states; counts steps with any coordinate
    change (for tree samplers the analog of SP acceptance counting,
    ``error.py:34-38``)."""
    moved = jnp.any(roots[1:] != roots[:-1], axis=-1)
    return jnp.mean(moved.astype(jnp.float32))
