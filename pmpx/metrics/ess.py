"""Effective sample size and autocorrelation diagnostics.

The reference's ESS/s and MSJD/s headline figures (README.md:56-57,
``ess_compare.pdf``/``msjd_compare.pdf``) were produced from million-step
sample dumps (``ess_per_s_MP.cu``, ``ess_per_s_PMP.cu``) by offline code
that is NOT in the repo (SURVEY.md §2.2, ``data_trans.py`` note).  This
module supplies the missing computation, on-device and vmappable:

* autocovariance via FFT (O(n log n));
* ESS with Geyer's initial-positive-sequence truncation (Geyer 1992), the
  standard estimator used by Stan/ArviZ/TFP;
* split-R-hat (Gelman-Rubin) over multiple chains as a bonus diagnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["autocov", "ess", "ess_per_dim", "split_rhat"]


def autocov(x: jnp.ndarray) -> jnp.ndarray:
    """Autocovariance of a 1-D series at all lags (biased, FFT-based)."""
    n = x.shape[0]
    xc = x - jnp.mean(x)
    nfft = 2 ** (2 * n - 1).bit_length()  # next pow2 >= 2n (zero padding)
    f = jnp.fft.rfft(xc, nfft)
    acov = jnp.fft.irfft(f * jnp.conj(f), nfft)[:n]
    return acov / n


def ess(x: jnp.ndarray) -> jnp.ndarray:
    """Effective sample size of a 1-D chain via Geyer pairing.

    Sums adjacent autocorrelation pairs rho[2t] + rho[2t+1] while positive
    (initial positive sequence); ESS = n / (-1 + 2 * sum of positive pairs).
    """
    n = x.shape[0]
    acov = autocov(x)
    rho = acov / jnp.maximum(acov[0], 1e-30)
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2).sum(axis=1)
    # keep pairs while all previous pairs (including this one) are positive
    positive = pairs > 0.0
    keep = jnp.cumprod(positive.astype(rho.dtype))
    tau = -1.0 + 2.0 * jnp.sum(pairs * keep)
    tau = jnp.maximum(tau, 1.0 / n)
    return jnp.minimum(n / tau, 1.0 * n)


def ess_per_dim(X: jnp.ndarray) -> jnp.ndarray:
    """ESS of each column of an (n, d) sample matrix."""
    return jax.vmap(ess, in_axes=1)(X)


def split_rhat(X: jnp.ndarray) -> jnp.ndarray:
    """Split-R-hat over (chains, n) draws of one scalar quantity."""
    c, n = X.shape
    half = n // 2
    halves = jnp.concatenate([X[:, :half], X[:, half : 2 * half]], axis=0)
    m, l = halves.shape
    chain_means = jnp.mean(halves, axis=1)
    chain_vars = jnp.var(halves, axis=1, ddof=1)
    B = l * jnp.var(chain_means, ddof=1)
    W = jnp.mean(chain_vars)
    var_plus = (l - 1) / l * W + B / l
    return jnp.sqrt(var_plus / jnp.maximum(W, 1e-30))
