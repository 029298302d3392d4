"""Sampler core: target protocol, batched evaluation, chain runner.

Design (contrast with the reference guifengye1/PMP-MCMC): every reference
script runs a host-side Python/C++ loop that crosses the device boundary
multiple times per superstep — H2D of proposals, kernel launch, D2H of
weights, host resampling (``conv_mp.cu:180-264``), or serial ``.item()``
round-trips per proposal net (``simple_net/lb.py:311-312``).  The README's
"additional overhead" column (README.md:39-48) is exactly this traffic.

Here one *superstep* is a pure function ``(key, theta) -> (theta', out)`` and
a chain is ``lax.scan`` over supersteps inside a single ``jit`` — chain state,
RNG, proposal generation and categorical resampling all stay in HBM, so the
reference's overhead column is structurally zero.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Protocol, runtime_checkable

import jax
import jax.numpy as jnp

__all__ = ["Target", "Tempered", "batch_log_prob", "run_chain"]


@runtime_checkable
class Target(Protocol):
    """A sampling target: unnormalized log-density over flat R^d states.

    Implementations may additionally provide

    * ``log_prob_batch(Theta: (P, d)) -> (P,)`` — fused batched evaluation
      (Pallas kernel, sufficient statistics, batched NN forward).  The engine
      prefers it over ``vmap(log_prob)`` when present.
    * ``grad_log_prob(theta) -> (d,)`` — used by HMC proposal flavors;
      defaults to ``jax.grad(log_prob)``.
    """

    d: int

    def log_prob(self, theta: jnp.ndarray) -> jnp.ndarray: ...


def batch_log_prob(
    target: Target, Theta: jnp.ndarray, key: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Evaluate log-density of all rows of ``Theta`` (P, d) -> (P,).

    This is the reference's "can be parallelized" step (``error.py:156-158``;
    CUDA thread-per-node ``conv_mp.cu:10-36``) realized as one batched call.
    Stochastic targets (``needs_rng = True``, e.g. mean-field BNNs whose
    forward samples weights) receive ``key``.
    """
    fused = getattr(target, "log_prob_batch", None)
    if getattr(target, "needs_rng", False):
        if fused is not None:
            return fused(Theta, key=key)
        keys = jax.random.split(key, Theta.shape[0])
        return jax.vmap(target.log_prob)(Theta, keys)
    if fused is not None:
        return fused(Theta)
    return jax.vmap(target.log_prob)(Theta)


class Tempered:
    """Scale a target's log-density by ``beta``.

    Captures the reference's likelihood-tempering divisors as explicit config:
    ``/2000`` (``conv_mp.cu:19``), ``/1000`` (``100000_MP.cu:19``), ``/10``
    (``500_MP.cu:19``), ``loss/10`` (``PMP_FC.py:44``), ``*50/N``
    (``lb.py:35``), ``lambda=10000`` (``MH_FC.py``).

    Forwards ``needs_rng``/keys and any fused ``value_and_grad_batch`` of
    the wrapped target.
    """

    def __init__(self, target: Target, beta: float):
        self.inner = target
        self.beta = float(beta)
        self.d = target.d
        self.needs_rng = bool(getattr(target, "needs_rng", False))
        if hasattr(target, "value_and_grad_batch"):
            if self.needs_rng:
                def vgb(Theta, key=None):
                    v, g = target.value_and_grad_batch(Theta, key=key)
                    return self.beta * v, self.beta * g
            else:
                def vgb(Theta):
                    v, g = target.value_and_grad_batch(Theta)
                    return self.beta * v, self.beta * g
            self.value_and_grad_batch = vgb

    def log_prob(self, theta, key=None):
        if self.needs_rng:
            return self.beta * self.inner.log_prob(theta, key)
        return self.beta * self.inner.log_prob(theta)

    def log_prob_batch(self, Theta, key=None):
        return self.beta * batch_log_prob(self.inner, Theta, key=key)


def run_chain(
    superstep: Callable[[jnp.ndarray, Any], tuple],
    key: jnp.ndarray,
    state0: Any,
    num_steps: int,
    collect: Optional[Callable[[Any, Any], Any]] = None,
    unroll: int = 1,
    log_every: Optional[int] = None,
    log_fn: Optional[Callable[[int, Any, Any], None]] = None,
):
    """Run ``num_steps`` supersteps under one ``lax.scan``.

    ``superstep(key, state) -> (state', out)``; ``collect(state', out)``
    chooses what to record per step (defaults to ``out``) — use it to thin
    large traces before they ever touch HBM layout for the scan stack.

    ``log_every``/``log_fn`` provide opt-in periodic host observability
    (the reference prints loss every 1k/10k steps, ``PMP_FC.py:147-155``):
    ``log_fn(step, state', out)`` runs host-side via ``jax.debug.callback``
    — useful for long runs, off by default since each callback syncs.

    Returns ``(final_state, stacked_records)``.
    """
    keys = jax.random.split(key, num_steps)

    def body(state, inp):
        k, i = inp
        state2, out = superstep(k, state)
        if log_every:
            fn = log_fn or (
                lambda step, st, o: print(f"[pmpx] step {step}")
            )

            def maybe_log(step, st, o):
                jax.lax.cond(
                    step % log_every == 0,
                    lambda: jax.debug.callback(fn, step, st, o),
                    lambda: None,
                )

            maybe_log(i, state2, out)
        rec = collect(state2, out) if collect is not None else out
        return state2, rec

    xs = (keys, jnp.arange(num_steps))
    return jax.lax.scan(body, state0, xs, unroll=unroll)
