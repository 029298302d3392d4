"""Sharded multi-chain execution: shard_map over the ``chains`` mesh axis.

Replaces the reference's "run the script N times pinned to N GPUs" protocol
(SURVEY.md §2.5) with one SPMD program: chains shard over ICI, each device
scans its chain batch locally (vmap inside), and — when a data axis is
present — every chain's likelihood is itself a ``psum`` over data shards.
There is no host round-trip anywhere in the step loop.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pmpx.parallel.mesh import AXIS_CHAINS, AXIS_DATA, AXIS_TREE
from pmpx.samplers.base import run_chain

__all__ = [
    "run_chains_sharded",
    "run_chains_vmapped",
    "run_chains_data_sharded",
    "run_chains_fused",
    "make_chain_farm_fused",
]


def run_chains_vmapped(
    superstep: Callable,
    keys: jnp.ndarray,
    theta0: jnp.ndarray,
    num_steps: int,
    collect: Optional[Callable] = None,
):
    """Single-device multi-chain: vmap of the scanned chain over leading axis.

    keys: (C,) key array, theta0: (C, d).  Returns (final (C, d), records
    stacked as (C, steps, ...)).
    """
    f = lambda k, t: run_chain(superstep, k, t, num_steps, collect=collect)
    return jax.vmap(f)(keys, theta0)


def run_chains_sharded(
    superstep: Callable,
    keys: jnp.ndarray,
    theta0: jnp.ndarray,
    num_steps: int,
    mesh: Mesh,
    collect: Optional[Callable] = None,
):
    """Multi-chain over the mesh ``chains`` axis, vmapped per device.

    keys: (C,) per-chain keys, theta0: (C, d), with C a multiple of the
    ``chains`` axis size.  The superstep may contain collectives over the
    ``data``/``tree`` axes (e.g. a data-sharded likelihood's psum) — state
    and keys are replicated across those axes, and since every device in a
    data/tree group sees identical keys and weights, their resampling
    decisions agree without any extra communication.
    """
    spec_chain = P(AXIS_CHAINS)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_chain, spec_chain),
        out_specs=(spec_chain, spec_chain),
        check_vma=False,
    )
    def run(local_keys, local_theta0):
        f = lambda k, t: run_chain(
            superstep, k, t, num_steps, collect=collect
        )
        return jax.vmap(f)(local_keys, local_theta0)

    return run(keys, theta0)


def make_chain_farm_fused(
    target,
    cfg,
    num_steps: int,
    mesh: Mesh,
    *,
    chunk: int = 512,
    rng: str = "kernel",
    interpret=False,
) -> Callable:
    """Build a reusable fused-megakernel chain farm: ``(keys, theta0) -> roots``.

    Constructs :func:`pmpx.kernels.fused_chain.make_fused_chain` and the
    shard_map'd runner ONCE; the returned callable is stable, so jit /
    shard_map caching keys on it and a warm-up call genuinely warms
    subsequent timed calls (the per-invocation construction inside the old
    ``run_chains_fused`` re-traced the Pallas kernel every call, paying
    remote-compile in the *timed* call — ADVICE r4).
    """
    from pmpx.kernels.fused_chain import make_fused_chain

    runk = make_fused_chain(target, cfg, chunk=chunk, rng=rng,
                            interpret=interpret)
    spec_chain = P(AXIS_CHAINS)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_chain, spec_chain),
        out_specs=spec_chain,
        check_vma=False,
    )
    def run(local_keys, local_theta0):
        return jax.lax.map(
            lambda kt: runk(kt[0], kt[1], num_steps),
            (local_keys, local_theta0),
        )

    return run


def run_chains_fused(
    target,
    cfg,
    keys: jnp.ndarray,
    theta0: jnp.ndarray,
    num_steps: int,
    mesh: Mesh,
    *,
    chunk: int = 512,
    rng: str = "kernel",
    interpret=False,
):
    """Chain farm over the PRODUCTION fused-megakernel path.

    Same SPMD shape as :func:`run_chains_sharded` — chains shard over the
    mesh ``chains`` axis, replacing the reference's hand-pinned one-process-
    per-GPU protocol (``ess_per_s_MP.cu:89`` ``cudaSetDevice``;
    SURVEY.md §2.5) — but each device runs its local chains through
    :func:`pmpx.kernels.fused_chain.make_fused_chain` (the whole chunk of
    every superstep inside one ``pallas_call``) instead of the XLA scan
    superstep.  Local chains are ``lax.map``'d, not vmapped: the megakernel
    owns the whole chip per step, so batching it adds no parallelism —
    across-device farming is where the scaling is.

    keys: (C,) per-chain PRNG keys; theta0: (C, 3); C a multiple of the
    ``chains`` axis size.  Returns the (C, num_steps, 3) root traces.
    Bit-identical to running ``make_fused_chain``'s ``run`` serially per
    chain with the same keys (asserted in ``tests/test_parallel.py``).

    One-shot convenience over :func:`make_chain_farm_fused` — for repeated
    calls (warm-up then timing) build the farm once with that instead.
    """
    farm = make_chain_farm_fused(
        target, cfg, num_steps, mesh, chunk=chunk, rng=rng,
        interpret=interpret,
    )
    return farm(keys, theta0)


def run_chains_data_sharded(
    make_superstep_local: Callable,
    x: jnp.ndarray,
    y: jnp.ndarray,
    keys: jnp.ndarray,
    theta0: jnp.ndarray,
    num_steps: int,
    mesh: Mesh,
    collect: Optional[Callable] = None,
):
    """Chains over ``chains`` axis x likelihood data over ``data`` axis.

    ``make_superstep_local(x_shard, y_shard) -> superstep`` builds the
    per-device superstep from its local data shard (typically closing over a
    :class:`pmpx.parallel.ShardedLinReg`, whose psum over ``data`` makes the
    weights — and hence the resampling decisions — identical across the data
    group without explicit synchronization).

    x, y: (n,) global data, n a multiple of the data-axis size;
    keys: (C,), theta0: (C, d) with C a multiple of the chains-axis size.
    """
    spec_chain = P(AXIS_CHAINS)
    spec_data = P(AXIS_DATA)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_data, spec_data, spec_chain, spec_chain),
        out_specs=(spec_chain, spec_chain),
        check_vma=False,
    )
    def run(x_local, y_local, local_keys, local_theta0):
        superstep = make_superstep_local(x_local, y_local)
        f = lambda k, t: run_chain(
            superstep, k, t, num_steps, collect=collect
        )
        return jax.vmap(f)(local_keys, local_theta0)

    return run(x, y, keys, theta0)
