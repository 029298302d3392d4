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

__all__ = [
    "autocov", "ess", "ess_per_dim", "split_rhat",
    "autocov_chunked", "ess_chunked",
]


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


def autocov_chunked(x, max_lag: int, block: int = 1 << 16):
    """Biased autocovariance up to ``max_lag``, memory-bounded (NumPy).

    :func:`autocov` pads to a 2n FFT — a ~2^21-point complex transient
    per 1M-step stream, large when the emit-all analysis sweeps 512
    streams (VERDICT r4 weak #6).  MCMC chains only need lags up to the
    Geyer truncation point (<< n), so this computes the EXACT same
    biased autocov for lags [0, max_lag] by overlap-save: per block of
    size B, ``c[l] = sum_i xc[s:s+B][i] * xc[s:s+B+L][i+l]`` via one
    (B+L)-point FFT pair, summed over blocks.  Peak transient is
    O(block + max_lag) independent of n.  Host-side on purpose: this is
    the offline analysis estimator (``data_trans.py``-stage analog),
    not the on-device one.
    """
    import numpy as np

    x = np.asarray(x, np.float64)
    n = x.shape[0]
    L = int(min(max_lag, n - 1))
    xc = x - x.mean()
    B = int(max(block, L + 1))
    nfft = 1 << (B + L).bit_length()
    acc = np.zeros(L + 1)
    for s in range(0, n, B):
        a = xc[s:s + B]
        b = xc[s:s + B + L]
        fa = np.fft.rfft(a, nfft)
        fb = np.fft.rfft(b, nfft)
        acc += np.fft.irfft(np.conj(fa) * fb, nfft)[: L + 1]
    return acc / n


def ess_chunked(x, max_lag: int = 4096, block: int = 1 << 16) -> float:
    """Geyer ESS identical to :func:`ess`, with bounded memory.

    Starts from ``max_lag`` and doubles until the initial-positive-
    sequence truncation point falls inside the window (or the window
    reaches n), so the result matches the full-FFT :func:`ess` to float
    tolerance while never materializing a 2n-padded spectrum.
    """
    import numpy as np

    x = np.asarray(x, np.float64)
    n = x.shape[0]
    L = int(min(max_lag, n - 1))
    while True:
        acov = autocov_chunked(x, L, block=block)
        rho = acov / max(acov[0], 1e-30)
        n_pairs = min(len(rho) // 2, n // 2)
        pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2).sum(axis=1)
        nonpos = np.nonzero(pairs <= 0.0)[0]
        if len(nonpos) or L >= n - 1:
            k = nonpos[0] if len(nonpos) else n_pairs
            tau = -1.0 + 2.0 * float(pairs[:k].sum())
            tau = max(tau, 1.0 / n)
            return float(min(n / tau, float(n)))
        L = int(min(2 * L, n - 1))


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
