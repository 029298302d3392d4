"""Data-sharded Bayesian linreg likelihood: per-shard sweep + psum over ICI.

TPU-native counterpart of the reference's within-likelihood data parallelism,
which is a serial per-thread loop over all data points on one GPU
(``conv_mp.cu:16-21``).  Each device holds a shard of (x, y), evaluates the
local RSS of all P proposals with the same kernel as the single-chip path,
and one ``psum`` over the ``data`` mesh axis produces the global RSS.
Intended for use inside ``shard_map`` (see ``pmpx.parallel.chains``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pmpx.kernels import linreg as _k
from pmpx.parallel.mesh import AXIS_DATA
from pmpx.targets.linreg import pad_to_grid

_LOG_2PI = math.log(2.0 * math.pi)

__all__ = ["ShardedLinReg"]


class ShardedLinReg:
    """Per-device shard of a BayesLinReg target; global log-lik via psum.

    Construct *inside* the shard_map body from the local (x, y) shard.
    ``n_total`` is the global data count (for the Gaussian normalization
    term); ``axis`` is the mesh axis name carrying the data shards.
    """

    d = 3

    def __init__(
        self,
        x_local: jnp.ndarray,
        y_local: jnp.ndarray,
        n_total: int,
        temper: float = 1.0,
        axis: str = AXIS_DATA,
        method: str = "xla",
    ):
        self.axis = axis
        self.temper = float(temper)
        self.n_total = int(n_total)
        self.method = method
        self.x2d = pad_to_grid(x_local)
        self.y2d = pad_to_grid(y_local)
        self.pad_count = int(self.x2d.size - x_local.shape[0])

    def log_prob(self, theta):
        return self.log_prob_batch(theta[None, :])[0]

    def log_prob_batch(self, Theta):
        b0, b1, sigma = Theta[:, 0], Theta[:, 1], Theta[:, 2]
        b0, b1, P = _k.pad_proposals(b0, b1)
        if self.method == "pallas":
            raw = _k.batched_rss(b0, b1, self.x2d, self.y2d)
        else:
            raw = _k.batched_rss_xla(b0, b1, self.x2d, self.y2d)
        local = raw - self.pad_count * b0 * b0
        rss = jax.lax.psum(local, self.axis)[:P]
        s2 = jnp.maximum(sigma * sigma, 1e-30)
        return self.temper * (
            -0.5 * self.n_total * (_LOG_2PI + jnp.log(s2))
            - rss / (2.0 * s2)
        )
