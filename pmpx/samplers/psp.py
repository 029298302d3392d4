"""PSP — prefetching single-proposal MCMC (binary speculation tree).

The reference's PSP (``simple_sampling/error/error.py:78-134``,
``simple_net/lb.py:189-279`` ``preMOptimizer``) speculates a depth-D binary
tree of single proposals and walks Barker factors along each node's path.
Structurally this is exactly the N=1 case of the general PMP engine (the
``judg`` while-loop decode is the N=1 special case of the mixed-radix group
indexing — see ``pmpx.tree``), so this module is a thin convenience wrapper
parameterized the way the reference parameterizes PSP: by the total number
of speculative states ``P`` (= N+1 in the reference's notation, a power of
two).
"""

from __future__ import annotations

import dataclasses

from pmpx import tree as tree_mod
from pmpx.samplers import pmp as pmp_mod
from pmpx.samplers.base import Target

__all__ = ["PSPConfig", "make_superstep"]


@dataclasses.dataclass(frozen=True)
class PSPConfig:
    P: int  # speculative states; must be a power of two
    step_size: float
    trans_sigma: float = 1.0
    selection: str = "all_uniform"
    stabilizer: str = "none"
    nan_guard: bool = True

    def as_pmp(self) -> pmp_mod.PMPConfig:
        return pmp_mod.PMPConfig(
            N=1,
            depth=tree_mod.binary_depth(self.P),
            step_size=self.step_size,
            trans_sigma=self.trans_sigma,
            selection=self.selection,
            stabilizer=self.stabilizer,
            nan_guard=self.nan_guard,
        )


def make_superstep(target: Target, cfg: PSPConfig):
    return pmp_mod.make_superstep(target, cfg.as_pmp())
