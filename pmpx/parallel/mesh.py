"""Device-mesh construction for chain/data/tree parallelism.

The reference's multi-device story is manual process pinning
(``cudaSetDevice(device)`` constants scattered across files,
``conv_mp.cu:99-102``; the ``--gpu`` flag of
``Bayesian Network Training/main.py:15-22``) with zero inter-device
communication.  Here parallelism is a named ``jax.sharding.Mesh``:

* ``chains`` — embarrassingly parallel independent chains (the reference's
  multi-GPU usage), rides ICI or DCN;
* ``data``   — the likelihood's data axis; per-shard partial log-liks are
  ``psum``-reduced over ICI (the reference's per-thread serial data loop,
  ``conv_mp.cu:16-21``, becomes a sharded reduction);
* ``tree``   — the speculative-state axis (P tree nodes), for trees too
  large for one chip's HBM/VMEM.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "AXIS_CHAINS", "AXIS_DATA", "AXIS_TREE"]

AXIS_CHAINS = "chains"
AXIS_DATA = "data"
AXIS_TREE = "tree"


def make_mesh(
    chains: int = 1,
    data: int = 1,
    tree: int = 1,
    devices=None,
) -> Mesh:
    """Build a (chains, data, tree) mesh from ``chains*data*tree`` devices."""
    if devices is None:
        devices = jax.devices()
    need = chains * data * tree
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for mesh ({chains},{data},{tree}), "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(chains, data, tree)
    return Mesh(arr, (AXIS_CHAINS, AXIS_DATA, AXIS_TREE))
