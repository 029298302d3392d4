"""Single-proposal Metropolis-Hastings (the reference's SP/MH baselines).

Two acceptance rules exist in the reference and both are provided:

* ``"barker"`` — accept with probability pi(y)/(pi(x)+pi(y))
  (``simple_sampling/error/error.py:17-40``);
* ``"metropolis"`` — accept with probability min(1, pi(y)/pi(x))
  (``simple_net/lb.py:47-85`` ``MetropolisOptimizer``,
  ``complex_nets/Mnist/FC/MH_FC.py:73-134``, ``conv_mh.cu:134-167``).

Proposal is an isotropic Gaussian random walk of scale ``step_size`` (the
reference's SP uses uniform(-0.25, 0.25) in ``error.py:27``; ``uniform`` is
provided for that parity case).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pmpx.samplers.base import Target

__all__ = ["MHConfig", "make_superstep"]


@dataclasses.dataclass(frozen=True)
class MHConfig:
    step_size: float
    rule: str = "metropolis"  # or "barker"
    proposal: str = "normal"  # or "uniform" (error.py:27 parity)

    def __post_init__(self):
        if self.rule not in ("metropolis", "barker"):
            raise ValueError(f"unknown MH rule {self.rule!r}")
        if self.proposal not in ("normal", "uniform"):
            raise ValueError(f"unknown proposal {self.proposal!r}")


def make_superstep(target: Target, cfg: MHConfig):
    def superstep(key: jnp.ndarray, theta: jnp.ndarray):
        k_eps, k_acc, k_t = jax.random.split(key, 3)
        if cfg.proposal == "normal":
            eps = cfg.step_size * jax.random.normal(
                k_eps, theta.shape, theta.dtype
            )
        else:
            eps = jax.random.uniform(
                k_eps,
                theta.shape,
                theta.dtype,
                -cfg.step_size,
                cfg.step_size,
            )
        prop = theta + eps
        # one batched call for {current, proposal} — same two evaluations
        # per iteration as the reference (MetropolisOptimizer calls logpost
        # twice, lb.py:65; conv_mh.cu's kernel evaluates both states), but
        # as a single fused batch
        from pmpx.samplers.base import batch_log_prob

        lp = batch_log_prob(
            target, jnp.stack([theta, prop]), key=k_t
        )
        lp_cur, lp_prop = lp[0], lp[1]
        if cfg.rule == "metropolis":
            log_acc = jnp.minimum(0.0, lp_prop - lp_cur)
        else:  # barker: p'/(p+p')
            log_acc = lp_prop - jnp.logaddexp(lp_cur, lp_prop)
        u = jax.random.uniform(k_acc, (), theta.dtype)
        accept = jnp.log(u) < log_acc
        theta2 = jnp.where(accept, prop, theta)
        return theta2, {
            "samples": theta2[None, :],
            "accepted": accept,
            "log_accept": log_acc,
            # chosen state's log-density (see pmp.make_superstep)
            "root_logp": jnp.where(accept, lp_prop, lp_cur),
        }

    return superstep
