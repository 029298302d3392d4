"""Data-sharded NN posterior: per-device image shards, psum'd loss/grads.

Extends the multi-chip story to the reference's flagship workload — the
full-batch image posteriors (``PMP_FC.py:117-118`` evaluates every
proposal network on all 60k MNIST images serially on one GPU;
``cifar_PMPhmc.py:126-163`` likewise on 50k CIFAR).  Here the image batch
shards over the ``data`` mesh axis: each device evaluates all P proposal
networks on its local shard (packed conv layout and proposal chunking
compose unchanged), one ``psum`` of the per-shard cross-entropy *sums*
yields the global mean loss, and for HMC a second ``psum`` of the local
gradients yields the global gradient of the replicated theta.

Construct inside a ``shard_map`` body from the local shard via
``from_posterior`` — model, parameter unraveling, temper, and aux
collections are inherited from a template ``NNPosterior`` built outside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from pmpx.parallel.mesh import AXIS_DATA

__all__ = ["ShardedNNPosterior"]


class ShardedNNPosterior:
    """Target-protocol view of one data shard; global density via psum.

    The global log-density is ``-temper * (sum_shards local_CE_sum) /
    n_total`` — identical to the unsharded ``NNPosterior`` on the
    concatenated data (mean of per-example CE).
    """

    def __init__(self, template, x_local, y_local, n_total: int,
                 axis: str = AXIS_DATA):
        # models with BatchNorm need *global* batch statistics: rebind to
        # a sync-BN variant (psum over the data axis) when supported, so
        # the sharded density equals the unsharded one exactly
        model = template.model
        if hasattr(model, "with_bn_axis"):
            model = model.with_bn_axis(axis)
        self.model = model
        self.compute_dtype = template.compute_dtype
        self.temper = template.temper
        self.needs_rng = template.needs_rng
        self.stochastic = template.stochastic
        self.proposal_chunk = template.proposal_chunk
        self._unravel = template._unravel
        self._aux = template._aux
        self.d = template.d
        self.X = x_local
        self.Y = y_local
        self.n_total = int(n_total)
        self.axis = axis

    # generic machinery shared with the single-chip target (duck-typed
    # self: both carry model/compute_dtype/_aux/_unravel/proposal_chunk)
    def _logits(self, theta, X, key=None):
        from pmpx.targets.nn import NNPosterior

        return NNPosterior._logits(self, theta, X, key)

    def _chunked(self, fn, Theta, keys):
        from pmpx.targets.nn import NNPosterior

        return NNPosterior._chunked(self, fn, Theta, keys)

    @classmethod
    def from_posterior(cls, template, x_local, y_local, n_total,
                       axis: str = AXIS_DATA):
        return cls(template, x_local, y_local, n_total, axis)

    # -- local-shard pieces ---------------------------------------------
    def _local_neg_loss_sum(self, theta, key=None):
        logits = self._logits(theta, self.X, key)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), self.Y
        ).sum()
        return -self.temper * ce / self.n_total

    # -- Target protocol (global semantics) ------------------------------
    def log_prob(self, theta, key=None):
        return jax.lax.psum(
            self._local_neg_loss_sum(theta, key), self.axis
        )

    def log_prob_batch(self, Theta, key=None):
        if self.stochastic:
            # one key per proposal, identical on every shard (callers pass
            # replicated keys), so all shards draw the same weight noise
            keys = jax.random.split(key, Theta.shape[0])
            f = lambda T, K: jax.vmap(self._local_neg_loss_sum)(T, K)
        else:
            keys = None
            f = lambda T, K: jax.vmap(
                lambda t: self._local_neg_loss_sum(t)
            )(T)
        local = self._chunked(f, Theta, keys)
        return jax.lax.psum(local, self.axis)

    def value_and_grad_batch(self, Theta, key=None):
        if self.stochastic:
            keys = jax.random.split(key, Theta.shape[0])
            f = lambda T, K: jax.vmap(
                jax.value_and_grad(self._local_neg_loss_sum),
                in_axes=(0, 0),
            )(T, K)
        else:
            keys = None
            f = lambda T, K: jax.vmap(
                jax.value_and_grad(
                    lambda t: self._local_neg_loss_sum(t)
                )
            )(T)
        v, g = self._chunked(f, Theta, keys)
        return (
            jax.lax.psum(v, self.axis),
            jax.lax.psum(g, self.axis),
        )

    def accuracy(self, theta, X=None, Y=None, key=None):
        """Global accuracy over all shards (psum of local correct counts
        over psum of local example counts)."""
        X = self.X if X is None else X
        Y = self.Y if Y is None else Y
        logits = self._logits(theta, X, key)
        correct = jnp.sum(
            (jnp.argmax(logits, axis=-1) == Y).astype(jnp.float32)
        )
        count = jnp.asarray(Y.shape[0], jnp.float32)
        return jax.lax.psum(correct, self.axis) / jax.lax.psum(
            count, self.axis
        )
