"""HMC-flavored samplers: SP-HMC, MP-HMC path, PMP-HMC speculation tree.

Reference semantics being reproduced (gradient-proposal family,
``complex_nets/Cifar-10/cifar_{SP,MP,PMP}hmc.py`` and
``Bayesian Network Training/main.py``):

* **SP-HMC** (``cifar_SPhmc.py:66-148``): one leapfrog step per iteration,
  momentum ``p ~ mom_scale * N(0, I)``, acceptance
  ``exp((H1 - H0) * accept_scale)`` (the reference hard-codes
  ``mom_scale=0.0005``, ``accept_scale=1000``).
* **MP-HMC** (``cifar_MPhmc.py:67-151``): one trajectory of N sequential
  leapfrog steps with a uniformly random reversal point ``ranint`` after
  which the step sign flips; weights ``A_j = exp(min(0, dH_j))`` for j>=1
  and ``A_0 = N - sum_j A_j``; one multinomial draw.
* **PMP-HMC** (``cifar_PMPhmc.py:114-171``, ``main.py:104-172``): binary
  speculation tree where every edge is one leapfrog step with a fresh
  momentum; the reference stores per-edge momenta in an (N+1, N+1, d)
  tensor (``cifar_PMPhmc.py:120``) — here only the two kinetic energies per
  edge survive (initial and evolved), collapsing the bookkeeping to two
  (P,) vectors.  Tree-walk acceptance with three rules:
  - ``"barker"``    — w_new/(w_new+w_old) on Hamiltonian weights (clean);
  - ``"mh_clamp"``  — the cifar variant: ``max(0, 1-w_old/w_new)`` on the
    parent side, ``min(1, w_new/w_old)`` on the child side
    (``cifar_PMPhmc.py:94-102``);
  - ``"barker_clamp"`` — the BNN variant: clamp first, then Barker-normalize
    (``main.py:84-99``).

Design note: the reference accumulates grads across ``.backward()`` calls
without ``zero_grad()`` (``cifar_PMPhmc.py:137,155``) — a bug we do NOT
reproduce; gradients here are exact ``jax.grad`` evaluations.  All level
generation is batched: every node of a level takes its leapfrog step in one
vmapped value_and_grad call instead of the reference's serial per-node
forward/backward.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pmpx import tree as tree_mod
from pmpx.samplers.base import Target
from pmpx.samplers.pmp import select_and_emit
from pmpx.samplers.stabilize import stabilize_logits

__all__ = ["HMCConfig", "MPHMCConfig", "PMPHMCConfig", "make_superstep"]


def _value_and_grad_batch(target: Target) -> Callable:
    """Uniform internal signature: vg(Theta, key) -> (values, grads).

    ``key`` is threaded only to stochastic targets (``needs_rng``); for
    deterministic targets it is ignored."""
    fused = getattr(target, "value_and_grad_batch", None)
    needs = getattr(target, "needs_rng", False)
    if fused is not None:
        if needs:
            return lambda Theta, key: fused(Theta, key=key)
        return lambda Theta, key: fused(Theta)
    if needs:
        g = jax.vmap(jax.value_and_grad(target.log_prob))
        return lambda Theta, key: g(
            Theta, jax.random.split(key, Theta.shape[0])
        )
    g = jax.vmap(jax.value_and_grad(target.log_prob))
    return lambda Theta, key: g(Theta)


def _leapfrog(vg, theta, p, step_size, key):
    """One leapfrog step for a batch: (B, d) positions/momenta.

    Returns (theta', p', logpi(theta'), grad(theta')).  Uses the gradient at
    theta (recomputed — one extra vg call per level keeps the code shape
    simple; the second vg at theta' is reused as the next level's base).
    ``key`` is required so stochastic (needs_rng) targets never silently
    reuse a constant noise stream."""
    k1, k2 = jax.random.split(key)
    _, g0 = vg(theta, k1)
    p_half = p + 0.5 * step_size * g0
    theta2 = theta + step_size * p_half
    lp2, g2 = vg(theta2, k2)
    p2 = p_half + 0.5 * step_size * g2
    return theta2, p2, lp2, g2


# --------------------------------------------------------------------------
# SP-HMC
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    step_size: float
    mom_scale: float = 1.0
    accept_scale: float = 1.0
    num_leapfrog: int = 1


def _make_sp_hmc(target: Target, cfg: HMCConfig):
    vg = _value_and_grad_batch(target)

    def superstep(key, theta):
        k_p, k_acc, k_t = jax.random.split(key, 3)
        p0 = cfg.mom_scale * jax.random.normal(
            k_p, theta.shape, theta.dtype
        )
        # distinct keys for the H0 evaluation and each leapfrog step, so
        # stochastic targets never correlate density evals across levels
        lf_keys = jax.random.split(k_t, cfg.num_leapfrog + 1)
        lp0, _ = vg(theta[None, :], lf_keys[0])
        th, p = theta[None, :], p0[None, :]
        for i in range(cfg.num_leapfrog):
            th, p, lp1, _ = _leapfrog(
                vg, th, p, cfg.step_size, lf_keys[i + 1]
            )
        h0 = lp0[0] - 0.5 * jnp.sum(p0 * p0)
        h1 = lp1[0] - 0.5 * jnp.sum(p[0] * p[0])
        log_acc = jnp.minimum(0.0, (h1 - h0) * cfg.accept_scale)
        u = jax.random.uniform(k_acc, (), theta.dtype)
        accept = jnp.log(u) < log_acc
        theta2 = jnp.where(accept, th[0], theta)
        return theta2, {
            "samples": theta2[None, :],
            "accepted": accept,
            "log_accept": log_acc,
        }

    return superstep


# --------------------------------------------------------------------------
# MP-HMC: one trajectory, random reversal point
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MPHMCConfig:
    N: int
    step_size: float
    mom_scale: float = 1.0
    nan_guard: bool = True


def _make_mp_hmc(target: Target, cfg: MPHMCConfig):
    vg = _value_and_grad_batch(target)
    N = cfg.N

    def superstep(key, theta):
        k_p, k_rev, k_draw, k_t = jax.random.split(key, 4)
        p0 = cfg.mom_scale * jax.random.normal(
            k_p, theta.shape, theta.dtype
        )
        # reversal point: steps with index >= ranint flip sign
        # (cifar_MPhmc.py:103-108; ranint = int(uniform(1, N+1)))
        ranint = jax.random.randint(k_rev, (), 1, N + 1)
        step_keys = jax.random.split(k_t, N + 1)
        lp0, _ = vg(theta[None, :], step_keys[0])

        def body(carry, inp):
            th, p = carry
            i, ki = inp
            sign = jnp.where(i >= ranint, -1.0, 1.0).astype(th.dtype)
            th2, p2, lp2, _ = _leapfrog(
                vg, th, p, sign * cfg.step_size, ki
            )
            ke = 0.5 * jnp.sum(p2 * p2, axis=-1)
            return (th2, p2), (th2[0], lp2[0], ke[0])

        (_, _), (traj, lps, kes) = jax.lax.scan(
            body,
            (theta[None, :], p0[None, :]),
            (jnp.arange(N), step_keys[1:]),
        )
        # states 0..N: index 0 = current
        Y = jnp.concatenate([theta[None, :], traj], axis=0)
        h = jnp.concatenate(
            [lp0 - 0.5 * jnp.sum(p0 * p0)[None], lps - kes]
        )
        # A_j = exp(min(0, H_j - H_0)), A_0 = N - sum_j A_j
        # (cifar_MPhmc.py:79-84)
        A_tail = jnp.exp(jnp.minimum(0.0, h[1:] - h[0]))
        A0 = N - jnp.sum(A_tail)
        A = jnp.concatenate([A0[None], A_tail])
        if cfg.nan_guard:
            A = jnp.where(jnp.isfinite(A), A, 1.0)
        A = jnp.maximum(A, 0.0)
        idx = jax.random.categorical(k_draw, jnp.log(A + 1e-30))
        theta2 = Y[idx]
        return theta2, {
            "samples": theta2[None, :],
            "log_accept": jnp.log(A + 1e-30),
            "root_index": idx,
        }

    return superstep


# --------------------------------------------------------------------------
# PMP-HMC: binary speculation tree of leapfrog edges
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PMPHMCConfig:
    depth: int
    step_size: float
    mom_scale: float = 1.0
    rule: str = "barker"  # | "mh_clamp" | "barker_clamp"
    stabilizer: str = "none"
    nan_guard: bool = True
    selection: str = "single"  # | "all_uniform" | "all_first"

    def __post_init__(self):
        if self.rule not in ("barker", "mh_clamp", "barker_clamp"):
            raise ValueError(f"unknown PMP-HMC rule {self.rule!r}")
        if self.selection not in ("single", "all_uniform", "all_first"):
            raise ValueError(f"unknown selection {self.selection!r}")

    @property
    def P(self) -> int:
        return 2**self.depth


def _make_pmp_hmc(target: Target, cfg: PMPHMCConfig):
    vg = _value_and_grad_batch(target)
    D = cfg.depth
    P = 2**D
    d = target.d

    # static per-level member/partner decode: member = x & (2^(c+1)-1),
    # partner = member ^ 2^c (the judg-loop semantics, cifar_PMPhmc.py:83-93)
    xs = np.arange(P)
    member = np.stack([xs & (2 ** (c + 1) - 1) for c in range(D)])  # (D, P)
    partner = np.stack([member[c] ^ (2**c) for c in range(D)])
    member_j = jnp.asarray(member)
    partner_j = jnp.asarray(partner)

    def superstep(key, theta):
        k_mom, k_draw, k_root, k_t = jax.random.split(key, 4)
        t_keys = jax.random.split(k_t, D + 1)
        lp_root, g_root = vg(theta[None, :], t_keys[D])

        Y = jnp.zeros((P, d), theta.dtype).at[0].set(theta)
        logpi = jnp.zeros((P,), theta.dtype).at[0].set(lp_root[0])
        G = jnp.zeros((P, d), theta.dtype).at[0].set(g_root[0])
        ke_init = jnp.zeros((P,), theta.dtype)
        ke_fin = jnp.zeros((P,), theta.dtype)

        mom_keys = jax.random.split(k_mom, D)
        for i in range(D):
            m = 2**i  # nodes 0..m-1 exist; children are k + m
            parents = Y[:m]
            p0 = cfg.mom_scale * jax.random.normal(
                mom_keys[i], (m, d), theta.dtype
            )
            # leapfrog using the cached parent gradient
            p_half = p0 + 0.5 * cfg.step_size * G[:m]
            child = parents + cfg.step_size * p_half
            lp_c, g_c = vg(child, t_keys[i])
            p_fin = p_half + 0.5 * cfg.step_size * g_c

            sl = slice(m, 2 * m)
            Y = Y.at[sl].set(child)
            logpi = logpi.at[sl].set(lp_c)
            G = G.at[sl].set(g_c)
            ke_init = ke_init.at[sl].set(0.5 * jnp.sum(p0 * p0, axis=-1))
            ke_fin = ke_fin.at[sl].set(0.5 * jnp.sum(p_fin * p_fin, axis=-1))

        # tree-walk acceptance
        logA = jnp.zeros((P,), theta.dtype)
        for c in range(D):
            j = member_j[c]  # (P,)
            q = partner_j[c]
            child = jnp.maximum(j, q)  # the edge's child node
            j_is_parent = j < q
            # Hamiltonian log-weights: parent side carries the edge's
            # initial kinetic energy, child side the evolved one
            lw_j = logpi[j] - jnp.where(
                j_is_parent, ke_init[child], ke_fin[child]
            )
            lw_q = logpi[q] - jnp.where(
                j_is_parent, ke_fin[child], ke_init[child]
            )
            if cfg.rule == "barker":
                logA = logA + lw_j - jnp.logaddexp(lw_j, lw_q)
            elif cfg.rule == "mh_clamp":
                # cifar_PMPhmc.py:94-102
                r = jnp.exp(lw_q - lw_j)
                factor = jnp.where(
                    j_is_parent,
                    jnp.maximum(0.0, 1.0 - r),
                    jnp.minimum(1.0, 1.0 / jnp.maximum(r, 1e-30)),
                )
                logA = logA + jnp.log(factor)
            else:  # barker_clamp, main.py:84-99
                r = jnp.exp(lw_q - lw_j)  # w_old / w_new
                s = 1.0 / jnp.maximum(r, 1e-30)  # w_new / w_old
                wn = jnp.where(
                    j_is_parent,
                    jnp.maximum(0.0, 1.0 - r),
                    jnp.minimum(1.0, s),
                )
                wo = jnp.where(
                    j_is_parent,
                    jnp.minimum(1.0, r),
                    jnp.maximum(0.0, 1.0 - s),
                )
                logA = logA + jnp.log(wn) - jnp.log(wn + wo)

        logits = stabilize_logits(logA, cfg.stabilizer, cfg.nan_guard)
        theta2, samples, root = select_and_emit(
            cfg, Y, logits, k_draw, k_root
        )
        return theta2, {
            "samples": samples,
            "log_accept": logA,
            "root_index": root,
        }

    return superstep


def make_superstep(target: Target, cfg):
    if isinstance(cfg, HMCConfig):
        return _make_sp_hmc(target, cfg)
    if isinstance(cfg, MPHMCConfig):
        return _make_mp_hmc(target, cfg)
    if isinstance(cfg, PMPHMCConfig):
        return _make_pmp_hmc(target, cfg)
    raise TypeError(f"unknown HMC config type {type(cfg)!r}")
