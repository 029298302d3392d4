"""Bayesian linear regression target: y = beta0 + beta1*x + sigma*eps.

The reference's main benchmark posterior (``simple_net/lb.py:11-17`` for the
generative setup; per-point Gaussian log-likelihood with tempering baked into
every CUDA kernel, ``conv_mp.cu:16-21``).  State is theta = (beta0, beta1,
sigma); the likelihood uses sigma**2 so it is sign-agnostic like the
reference's (which never constrains sigma; ``lb.py:34`` uses ``.abs()``,
``conv_mp.cu:19`` squares).

Four exact evaluation strategies, selectable per experiment:

* ``"pallas"`` — the O(P*n) data sweep as a Pallas VPU kernel
  (``pmpx.kernels.linreg``), the apples-to-apples counterpart of the
  reference CUDA kernels for benchmarking;
* ``"xla"`` — same sweep in pure XLA (non-TPU backends, numerics oracle);
* ``"fused"`` — O(n + P) per evaluation: the five data sufficient
  statistics (sum x, sum y, sum x^2, sum y^2, sum xy) are recomputed from
  the full dataset on every call (the data still streams through the chip
  each iteration) and the P residual sums follow in O(P).  Algebraically
  identical to the sweep; this is the TPU-first production path the CUDA
  design (one thread re-reading all data per proposal) cannot reach.
* ``"suffstats"`` — O(P) per evaluation with the statistics precomputed
  once at construction (valid because the data never changes).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.kernels import linreg as _k

__all__ = ["BayesLinReg", "make_synthetic_linreg", "pad_to_grid"]

_LOG_2PI = math.log(2.0 * math.pi)
_LANES = 128


def make_synthetic_linreg(
    key, n: int, beta0: float = -1.0, beta1: float = 2.0, sigma: float = 0.5
):
    """Synthetic dataset with the reference's generative parameters
    (``lb.py:12-14``, ``convery_time_MP.cu:107-110``): x ~ U(-1, 1),
    y = beta0 + beta1*x + sigma*N(0,1)."""
    kx, ke = jax.random.split(key)
    x = jax.random.uniform(kx, (n,), jnp.float32, -1.0, 1.0)
    y = beta0 + beta1 * x + sigma * jax.random.normal(ke, (n,), jnp.float32)
    return x, y


def pad_to_grid(x: jnp.ndarray, row_mult: int = 128):
    """Pad a 1-D array with zeros to a (rows, 128) lane-major grid."""
    n = x.shape[0]
    per_blk = row_mult * _LANES
    n_pad = ((n + per_blk - 1) // per_blk) * per_blk
    xp = jnp.zeros((n_pad,), jnp.float32).at[:n].set(x)
    return xp.reshape(n_pad // _LANES, _LANES)


class BayesLinReg:
    """theta = (beta0, beta1, sigma); log-lik tempered by ``temper``.

    ``temper`` captures the reference's per-experiment divisors as explicit
    config: 1/2000 (``conv_mp.cu:19``), 1/1000 (``100000_MP.cu:19``),
    1/10 (``500_MP.cu:19``), 50/n (``lb.py:35``).
    """

    d = 3

    def __init__(
        self,
        x: jnp.ndarray,
        y: jnp.ndarray,
        temper: float = 1.0,
        method: str = "auto",
    ):
        if method == "auto":
            # the fused statistics path is exact and the fastest on every
            # backend; the sweep kernels exist for like-for-like benchmark
            # comparison with the reference CUDA kernels and for the
            # general pattern (request "pallas"/"xla" explicitly)
            method = "fused"
        if method not in ("pallas", "xla", "fused", "suffstats"):
            raise ValueError(f"unknown linreg method {method!r}")
        self.method = method
        self.temper = float(temper)
        self.n = int(x.shape[0])
        self.x = jnp.asarray(x, jnp.float32)
        self.y = jnp.asarray(y, jnp.float32)
        # padded lane-major layout for the sweep kernels; each zero-padded
        # point contributes (0 - b0 - 0)^2 = b0^2 to the sweep, which is
        # subtracted analytically in _rss
        self.x2d = pad_to_grid(self.x)
        self.y2d = pad_to_grid(self.y)
        self.pad_count = int(self.x2d.size - self.n)
        # sufficient statistics (float64 on host for accuracy, cast once)
        xh = np.asarray(self.x, np.float64)
        yh = np.asarray(self.y, np.float64)
        self.stats = jnp.asarray(
            [
                xh.sum(),
                yh.sum(),
                (xh * xh).sum(),
                (yh * yh).sum(),
                (xh * yh).sum(),
            ],
            jnp.float32,
        )

    # -- rss strategies ----------------------------------------------------
    def _rss_from_stats(self, b0, b1, stats):
        sx, sy, sxx, syy, sxy = stats
        return (
            syy
            + self.n * b0 * b0
            + b1 * b1 * sxx
            + 2.0 * b0 * b1 * sx
            - 2.0 * b0 * sy
            - 2.0 * b1 * sxy
        )

    def _rss(self, b0, b1):
        if self.method == "pallas":
            raw = _k.batched_rss(b0, b1, self.x2d, self.y2d)
            return raw - self.pad_count * b0 * b0
        if self.method == "xla":
            raw = _k.batched_rss_xla(b0, b1, self.x2d, self.y2d)
            return raw - self.pad_count * b0 * b0
        if self.method == "fused":
            # recompute the statistics from the (zero-padded, hence exact)
            # data grid on every call: one O(n) streaming pass + O(P)
            x, y = self.x2d, self.y2d
            stats = (
                jnp.sum(x),
                jnp.sum(y),
                jnp.sum(x * x),
                jnp.sum(y * y),
                jnp.sum(x * y),
            )
            return self._rss_from_stats(b0, b1, stats)
        return self._rss_from_stats(b0, b1, self.stats)

    def _loglik_from_rss(self, rss, sigma):
        s2 = jnp.maximum(sigma * sigma, 1e-30)
        return self.temper * (
            -0.5 * self.n * (_LOG_2PI + jnp.log(s2)) - rss / (2.0 * s2)
        )

    def _rss_padded(self, b0, b1):
        """RSS handling the sweep kernels' proposal-tiling constraints."""
        if self.method in ("suffstats", "fused"):
            return self._rss(b0, b1)
        b0p, b1p, P = _k.pad_proposals(b0, b1)
        return self._rss(b0p, b1p)[:P]

    # -- Target protocol ---------------------------------------------------
    def log_prob(self, theta):
        return self.log_prob_batch(theta[None, :])[0]

    def value_and_grad_batch(self, Theta):
        """Fused (log-lik, gradient) for HMC proposal flavors.

        The Pallas sweep kernel has no autodiff rule; the gradient of the
        linreg log-likelihood is closed-form in the five data sufficient
        statistics, so values come from the configured method and gradients
        are exact analytic expressions — no differentiation through the
        kernel needed.
        """
        b0, b1, sigma = Theta[:, 0], Theta[:, 1], Theta[:, 2]
        rss = self._rss_padded(b0, b1)
        vals = self._loglik_from_rss(rss, sigma)
        sx, sy, sxx, _, sxy = self.stats
        sig = jnp.where(jnp.abs(sigma) < 1e-15, 1e-15, sigma)
        s2 = sig * sig
        drss_db0 = 2.0 * (self.n * b0 + b1 * sx - sy)
        drss_db1 = 2.0 * (b0 * sx + b1 * sxx - sxy)
        g0 = -self.temper * drss_db0 / (2.0 * s2)
        g1 = -self.temper * drss_db1 / (2.0 * s2)
        g2 = self.temper * (-self.n / sig + rss / (sig * s2))
        return vals, jnp.stack([g0, g1, g2], axis=-1)

    def log_prob_batch(self, Theta):
        b0, b1, sigma = Theta[:, 0], Theta[:, 1], Theta[:, 2]
        rss = self._rss_padded(b0, b1)
        return self._loglik_from_rss(rss, sigma)
