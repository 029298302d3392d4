"""MP — flat generalized multiple-try Metropolis.

The reference implements MP as its own copy of the weight loop in every
substrate (``error.py:43-77``, ``lb.py:122-186``, ``conv_mp.cu:10-36``,
``MP_FC.py:77-162``).  Structurally MP is exactly a depth-1 proposal tree:
one sibling group of N+1 states (current + N proposals), weights
``A_j = pi(y_j) * prod_{k != j} K(y_j, y_k)``, categorical resampling.  This
module is therefore a thin convenience wrapper over ``pmpx.samplers.pmp``.
"""

from __future__ import annotations

import dataclasses

from pmpx.samplers.base import Target
from pmpx.samplers import pmp as pmp_mod

__all__ = ["MPConfig", "make_superstep"]


@dataclasses.dataclass(frozen=True)
class MPConfig:
    N: int
    step_size: float
    trans_sigma: float = 1.0
    trans_normalize_by: float = 1.0
    selection: str = "all_uniform"
    stabilizer: str = "none"
    nan_guard: bool = True

    def as_pmp(self) -> pmp_mod.PMPConfig:
        return pmp_mod.PMPConfig(
            N=self.N,
            depth=1,
            step_size=self.step_size,
            trans_sigma=self.trans_sigma,
            trans_normalize_by=self.trans_normalize_by,
            selection=self.selection,
            stabilizer=self.stabilizer,
            nan_guard=self.nan_guard,
        )


def make_superstep(target: Target, cfg: MPConfig):
    return pmp_mod.make_superstep(target, cfg.as_pmp())
