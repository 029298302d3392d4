"""Static speculation-tree topology for prefetching multiple-proposal MCMC.

The reference (guifengye1/PMP-MCMC) builds its proposal tree with nested
host-side loops and decodes each node's per-level ancestors with a
data-dependent ``judg`` while-loop (``simple_sampling/error/error.py:103-121``,
re-implemented verbatim at ``simple_net/lb.py:216-240``,
``complex_nets/Mnist/FC/PMP_FC.py:119-136``,
``complex_nets/Cifar-10/cifar_PMPhmc.py:83-102``) or with an explicitly
materialized host-built transition table shipped to the GPU every iteration
(``tran_table``, ``simple_net/MH_MP_PMP_Compare_convergence/conv_pmp.cu:181-221``).

On TPU none of that is needed: the topology depends only on the static pair
``(N, depth)``, so every index the acceptance walk needs is computed **once at
trace time** as a constant array and the whole tree walk becomes a handful of
gathers.  This module is pure NumPy on purpose — everything here is a
compile-time constant.

Topology
--------
A tree with branching factor ``N`` (proposals per node) and ``depth`` levels
has ``P = (N+1)**depth`` nodes, indexed by mixed-radix digits base ``N+1``:

    x = sum_i  c_i(x) * (N+1)**i,     0 <= c_i <= N.

Generation (reference ``error.py:144-149``): at level ``i`` every node
``k < (N+1)**i`` spawns children ``k + (j+1)*(N+1)**i`` for ``j < N``.  Hence a
node's parent is obtained by zeroing its highest nonzero digit, and the set of
its per-level ancestors is ``x mod (N+1)**(i+1)``.

Acceptance walk (reference ``error.py:160-173``): at level ``i`` the sibling
group containing the residue ``h = x mod (N+1)**i`` is
``{h + j*(N+1)**i : j = 0..N}`` and node ``x`` identifies with member
``j = c_i(x)``.  For the binary case (N=1) this reduces to the reference's
``judg``-loop semantics: ``judg = x & (2**(c+1)-1)``, partner
``= judg XOR 2**c`` (verified bit-exactly against the loop in
``tests/test_tree.py``).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np

__all__ = [
    "TreeTopology",
    "topology",
    "num_nodes",
]


def num_nodes(N: int, depth: int) -> int:
    """Total speculative states in an (N, depth) proposal tree."""
    return (N + 1) ** depth


def binary_depth(P: int) -> int:
    """Depth of the binary tree with P nodes; rejects non-powers-of-two.

    Guards the reference's implicit ``log2(N+1)`` conversions (e.g.
    ``PMP_FC.py:108``), which silently truncate for invalid N and would run
    a much smaller tree than requested.
    """
    d = P.bit_length() - 1
    if P <= 0 or (1 << d) != P:
        raise ValueError(
            f"binary tree size must be a power of two, got {P} "
            "(use N = 2**k - 1 proposals)"
        )
    return d


@dataclasses.dataclass(frozen=True)
class TreeTopology:
    """All static index structure of an (N, depth) proposal tree.

    Attributes
    ----------
    N : branching factor (proposals spawned per node per level).
    depth : number of speculation levels (supersteps prefetched).
    P : total node count ``(N+1)**depth``.
    parent : (P,) int32 — parent node index; ``parent[0] == 0``.
    level_of : (P,) int32 — creation level of each node (position of its
        highest nonzero digit); root has level 0 by convention but is never
        "created".
    digits : (depth, P) int32 — ``digits[i, x] = c_i(x)``.
    residue : (depth, P) int32 — ``residue[i, x] = x mod (N+1)**i`` (the
        sibling-group base ``h`` of node ``x`` at level ``i``).
    group_members : tuple of (temp_i, N+1) int32 arrays, one per level —
        ``group_members[i][h, j] = h + j*(N+1)**i``.
    gather : (depth, P) int32 — flat index of node ``x`` into the per-level
        weight table ``L_i`` of shape ``(temp_i, N+1)`` flattened row-major:
        ``gather[i, x] = residue[i, x]*(N+1) + digits[i, x]``.
    path_matrix : (P, P) float32 — ``path_matrix[x, a] = 1`` iff node ``a``'s
        creation edge lies on the root→x path (i.e. ``a`` is ``x`` or one of
        its non-root ancestors).  ``Y = theta + path_matrix @ eps`` is the
        oracle formulation (used in tests); the runtime uses the equivalent
        ancestor gather-sum (see ``anc_index``/``anc_mask``), which is far
        cheaper than a (P, P) contraction for small d.
    anc_index : (depth, P) int32 — ``anc_index[i, x] = x mod (N+1)**(i+1)``,
        the node's ancestor (or itself) whose creation edge sits at level i.
    anc_mask : (depth, P) float32 — 1.0 where ``digits[i, x] != 0`` (the
        level-i edge actually exists on the root→x path), else 0.0, so that
        ``Y[x] = theta + sum_i anc_mask[i, x] * eps[anc_index[i, x]]``.
    new_nodes : tuple of 1-D int32 arrays, one per level — the node indices
        created at that level (``level_of == i``), in reference creation
        order ``k + temp*(j+1)``, ``j`` outer, ``k`` inner
        (``error.py:147-149``).
    """

    N: int
    depth: int
    P: int
    parent: np.ndarray
    level_of: np.ndarray
    digits: np.ndarray
    residue: np.ndarray
    group_members: tuple
    gather: np.ndarray
    path_matrix: np.ndarray
    anc_index: np.ndarray
    anc_mask: np.ndarray
    new_nodes: tuple

    @property
    def is_binary(self) -> bool:
        return self.N == 1


@lru_cache(maxsize=None)
def topology(N: int, depth: int) -> TreeTopology:
    """Build (and cache) the static topology for an (N, depth) tree."""
    if N < 1:
        raise ValueError(f"branching factor N must be >= 1, got {N}")
    if depth < 1:
        raise ValueError(f"tree depth must be >= 1, got {depth}")
    base = N + 1
    P = base**depth
    x = np.arange(P, dtype=np.int64)

    digits = np.empty((depth, P), dtype=np.int32)
    residue = np.empty((depth, P), dtype=np.int32)
    for i in range(depth):
        temp = base**i
        digits[i] = (x // temp) % base
        residue[i] = x % temp

    # Creation level = highest nonzero digit position; parent zeroes it.
    level_of = np.zeros(P, dtype=np.int32)
    parent = np.zeros(P, dtype=np.int64)
    nz = digits != 0  # (depth, P)
    has_any = nz.any(axis=0)
    # argmax over reversed rows gives highest nonzero digit position
    highest = (depth - 1) - np.argmax(nz[::-1], axis=0)
    level_of[has_any] = highest[has_any].astype(np.int32)
    hp = highest[has_any]
    parent[has_any] = x[has_any] - digits[hp, x[has_any]].astype(np.int64) * (
        base ** hp.astype(np.int64)
    )

    group_members = []
    for i in range(depth):
        temp = base**i
        h = np.arange(temp, dtype=np.int32)[:, None]
        j = np.arange(base, dtype=np.int32)[None, :]
        group_members.append(h + j * temp)

    gather = residue * base + digits

    # path_matrix[x, a] = 1 iff a in {x mod base**(i+1)} with digit c_i != 0
    pm = np.zeros((P, P), dtype=np.float32)
    anc_index = np.empty((depth, P), dtype=np.int32)
    anc_mask = np.empty((depth, P), dtype=np.float32)
    for i in range(depth):
        anc = (x % (base ** (i + 1))).astype(np.int64)
        mask = digits[i] != 0
        pm[x[mask], anc[mask]] = 1.0
        anc_index[i] = anc.astype(np.int32)
        anc_mask[i] = mask.astype(np.float32)

    new_nodes = []
    for i in range(depth):
        temp = base**i
        created = np.array(
            [k + temp * (j + 1) for j in range(N) for k in range(temp)],
            dtype=np.int32,
        )
        new_nodes.append(created)

    return TreeTopology(
        N=N,
        depth=depth,
        P=P,
        parent=parent.astype(np.int32),
        level_of=level_of,
        digits=digits,
        residue=residue,
        group_members=tuple(m for m in group_members),
        gather=gather.astype(np.int32),
        path_matrix=pm,
        anc_index=anc_index,
        anc_mask=anc_mask,
        new_nodes=tuple(new_nodes),
    )
