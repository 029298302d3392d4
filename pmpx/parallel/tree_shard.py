"""Tree-axis sharding: split the P speculative states across devices.

The speculation tree is this framework's scaling axis (SURVEY.md §5: the
structural analog of sequence parallelism).  The expensive stage of a
superstep is the batched target evaluation of all P states
(``error.py:156-158``); here each device evaluates a contiguous block of
P/T nodes and one tiled ``all_gather`` of the (P,) log-densities (a few KB)
restores the full weight vector.  Proposal generation, the tree walk, and
resampling are replicated — they are orders of magnitude cheaper and
replication keeps every shard's resampling decision identical without a
second collective.

Composes with the ``data`` axis: a data-sharded target's internal ``psum``
runs inside the per-node-block evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pmpx.parallel.mesh import AXIS_TREE
from pmpx.samplers.base import Target, batch_log_prob
from pmpx.samplers.pmp import (
    PMPConfig,
    log_accept_tree,
    select_and_emit,
    tree_positions,
)
from pmpx.samplers.stabilize import stabilize_logits

__all__ = ["make_tree_sharded_superstep"]


def make_tree_sharded_superstep(
    target: Target, cfg: PMPConfig, axis: str = AXIS_TREE
):
    """PMP superstep with target evaluation sharded over mesh axis ``axis``.

    Must run inside ``shard_map``; the chain state and PRNG key must be
    replicated across ``axis`` (each shard generates identical proposals).
    P must be divisible by the axis size.
    """
    topo = cfg.topology()
    trans = cfg.transition()
    P, d = topo.P, target.d

    def superstep(key: jnp.ndarray, theta: jnp.ndarray):
        k_eps, k_draw, k_root, k_target = jax.random.split(key, 4)
        eps = cfg.step_size * jax.random.normal(k_eps, (P, d), theta.dtype)
        Y = tree_positions(theta, eps, topo)

        ti = jax.lax.axis_index(axis)
        T = jax.lax.axis_size(axis)
        blk = P // T
        Y_local = jax.lax.dynamic_slice_in_dim(Y, ti * blk, blk, axis=0)
        lp_local = batch_log_prob(target, Y_local, key=k_target)
        logpi = jax.lax.all_gather(lp_local, axis, tiled=True)  # (P,)

        logA = log_accept_tree(Y, logpi, topo, trans)
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
