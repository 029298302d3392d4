"""PMP — prefetching multiple-proposal MCMC, the unified tree engine.

One engine covers all non-HMC sampler families of the reference:

* **PMP** general (N, depth) tree: ``simple_sampling/error/error.py:137-190``,
  ``simple_net/lb.py:286-369`` (``GMpreOptimizerV2``),
  ``conv_pmp.cu`` (N_step proposals per node, table-driven).
* **PSP / binary PMP** (1 proposal per node, depth log2(P)):
  ``error.py:78-134``, ``lb.py:189-279``, ``PMP_FC.py``, ``convery_time_PMP.cu``
  — exactly ``N=1`` here; the reference's ``judg`` while-loop partner decoding
  is the N=1 special case of the mixed-radix group indexing (see
  ``pmpx.tree``), verified bit-exactly in tests.
* **MP** flat multiple-try Metropolis: ``error.py:43-77``, ``lb.py:122-186``,
  ``conv_mp.cu`` — exactly ``depth=1`` here (a single sibling group; the
  global categorical normalizes, so flat-MTM raw weights and the normalized
  per-group weights sample identically).

Superstep structure (all on-device, inside jit):

1. proposal-tree generation: one (P, d) Gaussian innovation draw, positions
   via a single ``path_matrix @ eps`` MXU contraction (replaces the serial
   deepcopy loops ``lb.py:352-360`` and host tree build ``conv_pmp.cu:181-221``);
2. batched target evaluation of all P nodes at once;
3. per-level generalized-MTM weights with Barker/MTM normalization in log
   space (replaces linear-space products + exp-shift hacks);
4. on-device categorical resampling and next-root selection.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from pmpx import tree as tree_mod
from pmpx.transition import GaussianRW
from pmpx.samplers.base import Target, batch_log_prob
from pmpx.samplers.stabilize import stabilize_logits

__all__ = [
    "PMPConfig",
    "tree_positions",
    "log_accept_tree",
    "select_and_emit",
    "make_superstep",
]


@dataclasses.dataclass(frozen=True)
class PMPConfig:
    """Configuration of one PMP sampler.

    N : proposals per node per level (branching factor).
    depth : speculation levels.  ``depth=1`` is flat MP; ``N=1`` is the
        binary prefetching tree.
    step_size : proposal random-walk sigma (the reference's ``alpha``).
    trans_sigma : transition *density* sigma used in the MTM weights.  The
        reference almost always keeps this at 1.0 even when proposing with
        ``alpha`` (``lb.py:111-116``, ``conv_mp.cu:22-31``); set equal to
        ``step_size`` for the self-consistent kernel.
    trans_normalize_by : divide pairwise log-K by this (``PMP_FC.py:115``'s
        ``/para_num``); 0 means "use d" (auto).
    selection : what becomes of the P weighted draws —
        * ``"all_uniform"``: emit all P resampled states, next root uniform
          among them (``error.py:175-183``, ``lb.py:332-344``);
        * ``"all_first"``: emit all P, next root is draw 0
          (``conv_mp.cu:226-259``);
        * ``"single"``: one multinomial draw is both the emitted sample and
          the next root (``PMP_FC.py:141-143``).
    stabilizer : ``"none"`` (exact) or ``"zscore"`` (reference NN parity).
    nan_guard : replace non-finite weights with weight 1.
    """

    N: int
    depth: int
    step_size: float
    trans_sigma: float = 1.0
    trans_normalize_by: float = 1.0
    selection: str = "all_uniform"
    stabilizer: str = "none"
    nan_guard: bool = True

    def __post_init__(self):
        if self.selection not in ("all_uniform", "all_first", "single"):
            raise ValueError(f"unknown selection mode {self.selection!r}")
        if self.N < 1:
            raise ValueError(f"N must be >= 1, got {self.N}")
        if self.depth < 1:
            raise ValueError(f"depth must be >= 1, got {self.depth}")
        if self.step_size <= 0:
            raise ValueError(f"step_size must be > 0, got {self.step_size}")
        if self.stabilizer not in ("none", "zscore"):
            raise ValueError(f"unknown stabilizer {self.stabilizer!r}")

    @property
    def P(self) -> int:
        return tree_mod.num_nodes(self.N, self.depth)

    def topology(self) -> tree_mod.TreeTopology:
        return tree_mod.topology(self.N, self.depth)

    def transition(self) -> GaussianRW:
        return GaussianRW(
            sigma=self.trans_sigma, normalize_by=self.trans_normalize_by
        )


def tree_positions(
    theta: jnp.ndarray, eps: jnp.ndarray, topo: tree_mod.TreeTopology
) -> jnp.ndarray:
    """All P speculative positions from the current state and innovations.

    ``Y[x] = theta + sum of eps over the root->x creation path``, where the
    root->x path's level-i edge is node ``x mod (N+1)**(i+1)`` (present iff
    digit i of x is nonzero).  Computed as depth independent tile patterns
    (one per level) that XLA fuses into a single kernel — measured ~100x
    faster on v5e than either a gather formulation or a (P, P) path-matrix
    contraction (tiny d pads to 128 lanes).

    ``eps`` is (P, d); ``eps[0]`` is ignored (the root carries no
    innovation).
    """
    P, d = eps.shape
    base = topo.N + 1
    # Per-level path contributions as INDEPENDENT tile patterns XLA can
    # fuse into one kernel (no gathers — TPU lowers gathers poorly; no
    # sequential update chain): node x picks up eps[x mod (N+1)**(i+1)]
    # at level i iff digit i of x is nonzero, and within the first
    # temp*(N+1) indices that is just eps with its first temp rows zeroed,
    # tiled across the node axis.
    Y = jnp.broadcast_to(theta[None, :], (P, d)).astype(eps.dtype)
    for i in range(topo.depth):
        temp = base**i
        m = temp * base
        blk = jnp.concatenate(
            [jnp.zeros((temp, d), eps.dtype), eps[temp:m]], axis=0
        )
        Y = Y + jnp.tile(blk, (P // m, 1))
    return Y


def log_accept_tree(
    Y: jnp.ndarray,
    logpi: jnp.ndarray,
    topo: tree_mod.TreeTopology,
    trans: GaussianRW,
) -> jnp.ndarray:
    """Per-node log acceptance weights via the per-level generalized-MTM walk.

    For each level i with stride ``temp=(N+1)**i`` and sibling groups
    ``m[h, j] = h + j*temp``:

        w[h, j] = pi(Y[m_hj]) * prod_{k != j} K(Y[m_hj] -> Y[m_hk])
        contribution[x] = log( w[h_i(x), c_i(x)] / sum_j w[h_i(x), j] )

    (``error.py:160-173``); the final weight is the sum of contributions over
    levels.  For N=1 this is exactly the Barker factor walk of the reference's
    ``judg`` loops (``error.py:103-121``).  Deeper nodes inherit ancestor
    contributions through the residue indexing — the intent of the
    reference's broadcast loop (``error.py:171-173``), expressed exactly.
    """
    base = topo.N + 1
    P = topo.P
    logA = jnp.zeros(P, dtype=Y.dtype)
    for i in range(topo.depth):
        temp = base**i
        m = temp * base
        # Level-i sibling groups live entirely in the first m node indices:
        # group h's member j is node h + j*temp, i.e. the contiguous block
        # logpi[:m] reshaped (base, temp) and transposed — no gathers.
        lp_blk = logpi[:m].reshape(base, temp).T  # (temp, base)
        if topo.N == 1:
            # symmetric-kernel binary case: the single K factor appears on
            # both sides of every Barker pair and cancels (exactly as the
            # reference's pdf(judg,partner)/pdf(partner,judg) pairs), so
            # the MTM weight is the log-density alone
            lw = lp_blk
        else:
            G = jnp.transpose(
                Y[:m].reshape(base, temp, Y.shape[-1]), (1, 0, 2)
            )  # (temp, base, d)
            logK = trans.pairwise(G)  # (temp, base, base)
            offdiag = jnp.sum(logK, axis=-1) - jnp.diagonal(
                logK, axis1=-2, axis2=-1
            )
            lw = lp_blk + offdiag
        contrib = lw - jax.scipy.special.logsumexp(
            lw, axis=-1, keepdims=True
        )  # (temp, base)
        # node x < m is (h, c) = (x mod temp, x // temp) -> contrib.T flat;
        # node x >= m inherits its ancestor's factor: x mod m — a tile.
        block = contrib.T.reshape(m)
        logA = logA + jnp.tile(block, P // m)
    return logA


def select_and_emit(cfg, Y, logits, k_draw, k_root):
    """Resampling + next-root selection shared by all tree samplers.

    Implements the three reference selection modes (see PMPConfig) over
    stabilized logits; returns (theta', samples, root_index).
    """
    P = Y.shape[0]
    if cfg.selection == "single":
        idx = jax.random.categorical(k_draw, logits)
        theta2 = Y[idx]
        return theta2, theta2[None, :], idx
    from pmpx.resample import categorical_many

    draws = categorical_many(k_draw, logits, P)
    samples = Y[draws]
    if cfg.selection == "all_uniform":
        pick = jax.random.randint(k_root, (), 0, P)
        root = draws[pick]
    else:  # all_first
        root = draws[0]
    return Y[root], samples, root


def make_superstep(target: Target, cfg: PMPConfig):
    """Build the pure superstep ``(key, theta) -> (theta', out)``.

    ``out`` is a dict with:
      * ``samples``: (P, d) emitted states (modes ``all_*``) or (1, d)
        (mode ``single``);
      * ``log_accept``: (P,) raw log weights;
      * ``root_index``: chosen next-root node index (into the tree).
    """
    topo = cfg.topology()
    trans = cfg.transition()
    P, d = topo.P, target.d

    def superstep(key: jnp.ndarray, theta: jnp.ndarray):
        k_eps, k_draw, k_root, k_target = jax.random.split(key, 4)
        eps = cfg.step_size * jax.random.normal(k_eps, (P, d), theta.dtype)
        Y = tree_positions(theta, eps, topo)
        logpi = batch_log_prob(target, Y, key=k_target)
        logA = log_accept_tree(Y, logpi, topo, trans)
        logits = stabilize_logits(logA, cfg.stabilizer, cfg.nan_guard)
        theta2, samples, root = select_and_emit(
            cfg, Y, logits, k_draw, k_root
        )
        return theta2, {
            "samples": samples,
            "log_accept": logA,
            "root_index": root,
            # the chosen state's log-density, free for the taking here —
            # loss-trace collectors use it instead of re-evaluating the
            # full-batch density (the reference logs loss every step,
            # PMP_FC.py:147-155)
            "root_logp": logpi[root],
        }

    return superstep
