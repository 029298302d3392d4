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
    """PMP-HMC speculation tree.

    ``N`` is the leapfrog-children-per-node branching factor.  The
    reference only ever builds binary trees (``N=1``,
    ``cifar_PMPhmc.py:114-171``); general ``N`` is a pmpx extension: at
    every level each sibling group of ``N`` fresh-momentum leapfrog
    candidates forms one mixture-of-kernels decision (pick a candidate
    uniformly, accept with its own per-edge Hamiltonian rule), which
    reduces exactly to the reference's pairwise rules at ``N=1`` and
    satisfies per-level detailed balance for ``barker``/``mh_clamp`` at
    any ``N``.
    """

    depth: int
    step_size: float
    N: int = 1
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
        if self.N < 1:
            raise ValueError(f"N must be >= 1, got {self.N}")
        if self.depth < 1:
            raise ValueError(f"depth must be >= 1, got {self.depth}")

    @property
    def P(self) -> int:
        return (self.N + 1) ** self.depth


def _make_pmp_hmc(target: Target, cfg: PMPHMCConfig):
    """General (N, depth) PMP-HMC speculation tree.

    Topology is the mixed-radix tree of ``pmpx.tree`` (node x at level i
    belongs to sibling group ``x mod (N+1)**i`` as member ``c_i(x)``).
    Generation at level i batches ALL N*temp leapfrog edges in one vg
    call; the children land in the contiguous slice
    ``[temp, (N+1)*temp)`` in (member, group) order, so neither
    generation nor the tree walk needs a single gather: the per-level
    acceptance factors broadcast onto ``logA`` via a
    ``(P/(temp*(N+1)), N+1, temp)`` reshape.

    Per-level rule (x's group at level c, children y_1..y_N with edge
    momenta p_j):
      a_j = accept(H(y_j, p_j') - H(parent, p_j))   per cfg.rule
      P(member j) = a_j / N,   P(member 0) = 1 - sum_j a_j / N
    — a uniform mixture of N single-edge MH/Barker kernels, so each
    level decision is exactly reversible; at N=1 this reproduces the
    reference's binary pairwise factors (``cifar_PMPhmc.py:94-102``
    for mh_clamp, ``main.py:84-99`` for barker_clamp) bit-for-bit.
    ``barker_clamp``'s parent mass is the reference's quirky
    ``max(0, 1 - w_old/w_new)`` (doesn't complement the child mass);
    it generalizes as the mean of the per-edge quirk masses.
    """
    vg = _value_and_grad_batch(target)
    D = cfg.depth
    N = cfg.N
    base = N + 1
    P = base**D
    d = target.d

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
            temp = base**i  # nodes 0..temp-1 exist
            # children of level i: index (j+1)*temp + k for member j+1,
            # group k — i.e. the contiguous slice [temp, base*temp) in
            # (member, group) order after tiling parents N times
            parents = jnp.tile(Y[:temp], (N, 1))
            g_par = jnp.tile(G[:temp], (N, 1))
            p0 = cfg.mom_scale * jax.random.normal(
                mom_keys[i], (N * temp, d), theta.dtype
            )
            # leapfrog using the cached parent gradient
            p_half = p0 + 0.5 * cfg.step_size * g_par
            child = parents + cfg.step_size * p_half
            lp_c, g_c = vg(child, t_keys[i])
            p_fin = p_half + 0.5 * cfg.step_size * g_c

            sl = slice(temp, base * temp)
            Y = Y.at[sl].set(child)
            logpi = logpi.at[sl].set(lp_c)
            G = G.at[sl].set(g_c)
            ke_init = ke_init.at[sl].set(0.5 * jnp.sum(p0 * p0, axis=-1))
            ke_fin = ke_fin.at[sl].set(0.5 * jnp.sum(p_fin * p_fin, axis=-1))

        # tree-walk acceptance, gather-free
        logA = jnp.zeros((P,), theta.dtype)
        tiny = jnp.asarray(1e-30, theta.dtype)
        for c in range(D):
            temp = base**c
            # per-edge Hamiltonian difference for the level-c children:
            # child j of group h sits at (j+1)*temp + h
            lp_par = logpi[:temp]  # (temp,)
            blk = slice(temp, base * temp)
            lp_ch = logpi[blk].reshape(N, temp)
            kei = ke_init[blk].reshape(N, temp)
            kef = ke_fin[blk].reshape(N, temp)
            dh = (lp_ch - kef) - (lp_par[None, :] - kei)  # (N, temp)
            if cfg.rule == "barker":
                la = jax.nn.log_sigmoid(dh)  # log child masses, exact
                if N == 1:
                    lparent = jax.nn.log_sigmoid(-dh)[0]
                else:
                    lparent = jnp.log(jnp.maximum(
                        1.0 - jnp.sum(jnp.exp(la), axis=0) / N, tiny
                    ))
            else:
                # mh_clamp (cifar_PMPhmc.py:94-102).  barker_clamp
                # (main.py:84-99) clamps to the same masses and then
                # Barker-normalizes — but the normalizer is identically 1
                # (min(1,s) + max(0,1-s) == 1 for all s), so the two
                # reference rules coincide numerically.
                la = jnp.minimum(0.0, dh)
                lparent = jnp.log(jnp.maximum(
                    1.0 - jnp.sum(jnp.exp(la), axis=0) / N, tiny
                ))
            # factor table f[m, h] for member m of group h at this level
            f = jnp.concatenate(
                [lparent[None, :], la - jnp.log(float(N))], axis=0
            )  # (base, temp)
            # node x = q*(base*temp) + m*temp + h picks f[m, h]:
            # broadcast over the higher-digit axis q via reshape
            logA = (
                logA.reshape(-1, base, temp) + f[None, :, :]
            ).reshape(P)

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
