"""Neural-network posteriors as flattened-parameter targets.

The reference treats an NN posterior as "a network whose loss defines a
density": proposals are whole deep-copied ``nn.Module``s mutated in place
(``PMP_FC.py:96-102``), evaluated serially per proposal
(``PMP_FC.py:117-118``), with weights ``exp(-loss)``.  Here the chain state
is the raveled parameter vector theta in R^d; the proposal axis is a leading
batch axis and all P speculative networks evaluate in ONE vmapped full-batch
forward — the parallelism the reference's comments promise ("可并行/can be
parallelized") but its torch path never achieves.

Supports:
* deterministic models (MLP/CNN/LSTM/LeNet; LeNet's BatchNorm runs in
  batch-statistics mode, its stats treated as ephemeral);
* stochastic models (BayesMLP): every density evaluation draws fresh weights
  through a ``"sample"`` RNG stream, matching torchbnn's sampling forward
  (``Bayesian Network Training/main.py``); such targets advertise
  ``needs_rng = True`` and receive a PRNG key from the sampler.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from pmpx.samplers.base import Target  # noqa: F401  (protocol reference)

__all__ = ["NNPosterior"]


class NNPosterior:
    """log pi(theta) = -temper * CrossEntropy(model(X; theta), Y).

    ``temper`` captures the reference's loss scalings: 0.1 (``PMP_FC.py:44``
    loss/10), 1e4 (``MH_FC.py`` lambda), 1.0 (HMC scripts).
    """

    def __init__(
        self,
        model,
        X: jnp.ndarray,
        Y: jnp.ndarray,
        temper: float = 1.0,
        init_key: Optional[jnp.ndarray] = None,
        stochastic: bool = False,
        compute_dtype=None,
        proposal_chunk: Optional[int] = None,
    ):
        """``compute_dtype=jnp.bfloat16`` runs the forward pass (params and
        activations) in bf16 for MXU throughput; the chain state, loss
        reduction, and gradients stay f32.  The reference runs torch f32
        everywhere — bf16 is the TPU-native option for the big posteriors.

        ``proposal_chunk`` bounds how many of the P speculative networks
        evaluate concurrently: a full vmap multiplies activation memory by
        P (a conv net at full batch OOMs at P=8 on one chip), so chunks of
        size c evaluate via a sequential ``lax.map`` of width-c vmaps —
        the memory/throughput dial between the reference's fully serial
        loop (c=1) and full parallelism (c=P).
        """
        self.model = model
        self.compute_dtype = compute_dtype
        self.X = (
            X.astype(compute_dtype) if compute_dtype is not None else X
        )
        self.Y = Y
        self.temper = float(temper)
        self.stochastic = bool(stochastic)
        self.needs_rng = self.stochastic
        self.proposal_chunk = proposal_chunk
        init_key = (
            init_key if init_key is not None else jax.random.key(0)
        )
        k_params, k_sample = jax.random.split(init_key)
        rngs = {"params": k_params}
        if stochastic:
            rngs["sample"] = k_sample
        # jit the init: eager flax init dispatches dozens of small ops,
        # which is pathologically slow over remote-device transports
        variables = jax.jit(model.init)(rngs, X[:2])
        params = variables["params"]
        self._aux = {
            k: v for k, v in variables.items() if k != "params"
        }
        flat, unravel = ravel_pytree(params)
        self.d = int(flat.size)
        self._theta0 = flat
        self._unravel = unravel
        # Optional fused-kernel density (e.g. pmpx.kernels.lstm_fused
        # .attach): a drop-in log_prob_batch that bypasses the XLA
        # forward.  Gradient paths keep the XLA route regardless.
        self._fast_batch = None

    # ------------------------------------------------------------------
    @contextmanager
    def bound_data(self, X, Y=None):
        """Temporarily rebind the dataset — the trace-time hook that turns
        ``X`` into a *jit argument* instead of a closure constant.

        Every density method reads ``self.X`` at trace time, so tracing
        inside ``with target.bound_data(x_tracer):`` threads the data
        through the compiled program's parameters.  Closure constants are
        shipped inside the serialized HLO, which at full reference scale
        (50k CIFAR images = 600 MB) exceeds what remote-compile transports
        accept — and wastes compile-cache keys on data bytes.

        Single-trace-at-a-time: the rebinding is shared mutable state, so
        nested/concurrent binds of the same posterior would cross-bind
        datasets — guarded with a loud error.
        """
        if getattr(self, "_data_bound", False):
            raise RuntimeError(
                "bound_data is not reentrant: this NNPosterior already "
                "has a dataset bound (nested or concurrent traces of one "
                "posterior would cross-bind datasets)"
            )
        self._data_bound = True
        old_x, old_y = self.X, self.Y
        self.X = X if self.compute_dtype is None else X.astype(
            self.compute_dtype
        )
        if Y is not None:
            self.Y = Y
        try:
            yield self
        finally:
            self.X, self.Y = old_x, old_y
            self._data_bound = False

    def init_theta(self) -> jnp.ndarray:
        """Raveled freshly-initialized parameters (the reference warm-starts
        from pretrained ``.pkl`` checkpoints; see ``theta_from_params``)."""
        return self._theta0

    def theta_from_params(self, params) -> jnp.ndarray:
        """Ravel an externally-trained parameter pytree (warm start)."""
        flat, _ = ravel_pytree(params)
        return flat

    # ------------------------------------------------------------------
    def _logits(self, theta, X, key=None):
        params = self._unravel(theta)
        if self.compute_dtype is not None:
            params = jax.tree.map(
                lambda p: p.astype(self.compute_dtype), params
            )
            X = X.astype(self.compute_dtype)
        variables = {"params": params, **self._aux}
        kwargs = {}
        if self.stochastic:
            kwargs["rngs"] = {"sample": key}
        if self._aux:
            out, _ = self.model.apply(
                variables, X, mutable=list(self._aux.keys()), **kwargs
            )
            return out
        return self.model.apply(variables, X, **kwargs)

    def _neg_loss(self, theta, key=None):
        logits = self._logits(theta, self.X, key)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), self.Y
        ).mean()
        return -self.temper * loss

    # -- Target protocol ------------------------------------------------
    def log_prob(self, theta, key=None):
        if self._fast_batch is not None:
            # route singles through the kernel too: acceptance ratios
            # must compare densities produced by ONE floating-point
            # evaluation order, never a mix of kernel and XLA rounding
            return self._fast_batch(theta[None])[0]
        return self._neg_loss(theta, key)

    def _chunked(self, fn, Theta, keys):
        """Apply a vmapped fn over proposal chunks of bounded width."""
        P = Theta.shape[0]
        c = self.proposal_chunk
        if c is None or c >= P:
            return fn(Theta, keys)
        if P % c:
            raise ValueError(
                f"proposal_chunk={c} must divide the batch size {P}"
            )
        Th = Theta.reshape(P // c, c, Theta.shape[-1])
        Ks = keys.reshape(P // c, c) if keys is not None else None
        if Ks is None:
            out = jax.lax.map(lambda t: fn(t, None), Th)
        else:
            out = jax.lax.map(lambda tk: fn(tk[0], tk[1]), (Th, Ks))
        return jax.tree.map(
            lambda a: a.reshape((P,) + a.shape[2:]), out
        )

    def log_prob_batch(self, Theta, key=None):
        if self._fast_batch is not None:
            return self._fast_batch(Theta)
        if self.stochastic:
            keys = jax.random.split(key, Theta.shape[0])
            f = lambda T, K: jax.vmap(self._neg_loss)(T, K)
        else:
            keys = None
            f = lambda T, K: jax.vmap(lambda t: self._neg_loss(t))(T)
        return self._chunked(f, Theta, keys)

    def value_and_grad_batch(self, Theta, key=None):
        if self.stochastic:
            keys = jax.random.split(key, Theta.shape[0])
            f = lambda T, K: jax.vmap(
                jax.value_and_grad(self._neg_loss), in_axes=(0, 0)
            )(T, K)
        else:
            keys = None
            f = lambda T, K: jax.vmap(
                jax.value_and_grad(lambda t: self._neg_loss(t))
            )(T)
        return self._chunked(f, Theta, keys)

    # ------------------------------------------------------------------
    def accuracy(self, theta, X=None, Y=None, key=None):
        """Classification accuracy (the reference logs train/test correct
        ratios every 1k/10k steps, ``PMP_FC.py:147-156``)."""
        X = self.X if X is None else X
        Y = self.Y if Y is None else Y
        logits = self._logits(theta, X, key)
        return jnp.mean((jnp.argmax(logits, axis=-1) == Y).astype(
            jnp.float32
        ))
