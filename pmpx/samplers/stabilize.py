"""Weight stabilization devices, as explicit configuration.

The reference hand-tunes several numerically-motivated transformations of the
log acceptance weights before resampling; each materially changes (or, in log
space, does not change) the sampled chain, so they are explicit options here:

* ``none`` — exact log-space weights.  ``jax.random.categorical`` consumes
  logits directly, so the reference's exp-shift tables
  (``A_hat = exp(A + adjust_A)``, ``conv_mp.cu:88-97``,
  ``ess_per_s_MP.cu:85-100`` — hand-maintained per-N constants) are a no-op
  on-device: a constant logit shift never changes a categorical.  ``none`` is
  therefore the faithful *intent* of exp-shift without the table.
* ``zscore`` — ``(logA - mean)/std`` (``PMP_FC.py:138-141``,
  ``MP_FC.py:116-119``, and the commented-out ``standardize()`` in
  ``conv_mp.cu:55-61``).  NOTE: this rescales log-weights, i.e. it *tempers*
  the selection distribution — reproduced only for parity with the reference
  NN experiments.
* NaN/Inf guard — replaces NaN and +inf weights with weight 1 (logit 0),
  from ``cifar_PMPhmc.py:106-107`` and ``Bayesian Network Training/main.py``.
  NOTE the reference guards in *linear* space, where a zero weight is a
  legitimate "never select this node" and is left at 0; the log-space
  equivalent is that ``-inf`` logits must stay ``-inf`` — only NaN (0/0
  etc.) and +inf (overflow) are sanitized.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["stabilize_logits"]


def stabilize_logits(
    logA: jnp.ndarray, mode: str = "none", nan_guard: bool = True
) -> jnp.ndarray:
    if mode == "zscore":
        mean = jnp.mean(logA)
        std = jnp.std(logA)
        logA = (logA - mean) / jnp.maximum(std, 1e-30)
    elif mode != "none":
        raise ValueError(f"unknown stabilizer mode: {mode!r}")
    if nan_guard:
        bad = jnp.isnan(logA) | (logA == jnp.inf)
        logA = jnp.where(bad, 0.0, logA)
    return logA
