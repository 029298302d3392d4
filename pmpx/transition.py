"""Proposal transition kernels K(a -> b) in log space.

The reference evaluates transition densities in four inconsistent ways:

* unit-variance Gaussian pdf regardless of the proposal step size
  (``simple_sampling/error/error.py:61``, ``simple_net/lb.py:111-116``,
  ``conv_mp.cu:22-31`` — all use sigma=1 while proposing with sigma=alpha);
* per-parameter Gaussian averaged over the parameter count
  (``complex_nets/Mnist/FC/PMP_FC.py:113-116``: ``(...).sum()/para_num``);
* sigma=0.5 with an ad-hoc ``10**(d/10)`` overflow-avoidance scale
  (``complex_nets/correlation/com_dim.py:18-21`` — a constant factor per K
  which cancels in every normalized weight ratio, so it is a numerical
  device only and is unnecessary in log space);
* Hamiltonian kinetic terms for the HMC variants (handled in
  ``pmpx.samplers.hmc``, not here).

Here each kernel is one pure function returning pairwise log-densities for a
group of states, shaped for MXU-friendly batched evaluation.  Everything is
symmetric Gaussian random walk (all reference kernels are), but the class is
the seam for asymmetric kernels.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

__all__ = ["GaussianRW"]

_LOG_2PI = math.log(2.0 * math.pi)


@dataclasses.dataclass(frozen=True)
class GaussianRW:
    """Isotropic Gaussian random-walk transition kernel.

    log K(a -> b) = sum_dims [ -0.5*log(2*pi*sigma^2) - (b-a)^2/(2*sigma^2) ]
    optionally divided by ``normalize_by`` (the reference's ``/para_num``
    averaging for NN posteriors, ``PMP_FC.py:115``).

    ``sigma`` is the *density* sigma, which in the reference usually differs
    from the proposal step size alpha (see module docstring).
    """

    sigma: float = 1.0
    normalize_by: float = 1.0

    def pairwise(self, G: jnp.ndarray) -> jnp.ndarray:
        """Pairwise log-K for grouped states.

        G : (..., M, d) group member positions.
        Returns (..., M, M) with out[..., j, k] = log K(G[...,j] -> G[...,k]).

        For small d the (..., M, M, d) broadcasted difference is cheapest
        (profiled ~25% faster than the gram form at d=3, M=1024 on v5e —
        tiny-d matmuls pad the contraction to 128 lanes); for large d the
        ||a||^2 + ||b||^2 - 2 a.b expansion makes the inner contraction a
        batched MXU matmul and avoids the huge intermediate.
        """
        d = G.shape[-1]
        const = -0.5 * d * (_LOG_2PI + 2.0 * math.log(self.sigma))
        if d <= 8:
            diff = G[..., :, None, :] - G[..., None, :, :]
            dist2 = jnp.sum(diff * diff, axis=-1)
        else:
            sq = jnp.sum(G * G, axis=-1)  # (..., M)
            # full f32 accumulation: the default (fast, bf16-ish) matmul
            # precision visibly perturbs acceptance weights
            gram = jnp.einsum(
                "...jd,...kd->...jk",
                G,
                G,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            dist2 = sq[..., :, None] + sq[..., None, :] - 2.0 * gram
            dist2 = jnp.maximum(dist2, 0.0)
        return (const - dist2 / (2.0 * self.sigma**2)) / self.normalize_by

    def log_k(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """log K(a -> b) for matching leading shapes; a, b: (..., d)."""
        d = a.shape[-1]
        diff = b - a
        const = -0.5 * d * (_LOG_2PI + 2.0 * math.log(self.sigma))
        return (
            const - jnp.sum(diff * diff, axis=-1) / (2.0 * self.sigma**2)
        ) / self.normalize_by
