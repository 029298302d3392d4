"""Declarative experiment configuration.

The reference's "config system" is editing hardcoded constants at the top of
30 copy-pasted scripts (SURVEY.md §5; the lone CLI is
``Bayesian Network Training/main.py:15-22`` with ``--gpu``/``--N``).  Here
one dataclass tree covers (target, algorithm, N, depth, alpha, tempering,
steps, selection, stabilizer, mesh, seed) and loads from YAML/JSON or CLI
overrides.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional

__all__ = ["SamplerSpec", "RunSpec", "load_spec"]


@dataclasses.dataclass
class SamplerSpec:
    """Which sampler and its knobs.

    algo: mh | mp | psp | pmp | sp_hmc | mp_hmc | pmp_hmc
    """

    algo: str = "pmp"
    N: int = 1
    depth: int = 3
    step_size: float = 0.1
    trans_sigma: float = 1.0
    # None means "this algo's own default": all_uniform for the tree
    # samplers but single for pmp_hmc (the reference's cifar protocol),
    # metropolis for MH but barker for pmp_hmc.  Explicit values are
    # always honored (and rejected loudly when invalid for the algo).
    selection: Optional[str] = None
    stabilizer: str = "none"
    rule: Optional[str] = None  # HMC acceptance rule / MH rule
    proposal: str = "normal"  # MH only: "uniform" for error.py:27 parity
    mom_scale: float = 1.0
    num_leapfrog: int = 1
    accept_scale: float = 1.0

    @classmethod
    def reference_nn(cls, algo: str, N: int, **kw) -> "SamplerSpec":
        """Spec for the reference's NN protocols, where ``N`` (the
        ``--N`` CLI flag / top-of-file constant) means *N+1 speculative
        states in a binary prefetch tree* (``cifar_PMPhmc.py:114-120``,
        ``main.py:15-22``).  Encodes that convention once: tree samplers
        get ``N=1, depth=log2(N+1)`` (binary), flat samplers keep ``N``.
        Pass tree shape directly to ``SamplerSpec`` itself for the
        beyond-reference general-(N, depth) trees.
        """
        from pmpx import tree

        if algo in ("pmp", "pmp_hmc", "psp"):
            return cls(algo=algo, N=1, depth=tree.binary_depth(N + 1), **kw)
        # flat samplers: depth=1 so the spec carries no phantom tree shape
        # (a depth-3 mp spec would imply 512 states to any consumer that
        # honored it)
        return cls(algo=algo, N=N, depth=1, **kw)

    def build(self, target):
        """Return the superstep for this spec over ``target``."""
        from pmpx.samplers import hmc, mh, mp, pmp
        from pmpx.samplers.hmc import HMCConfig, MPHMCConfig, PMPHMCConfig
        from pmpx.samplers.mh import MHConfig
        from pmpx.samplers.mp import MPConfig
        from pmpx.samplers.pmp import PMPConfig

        selection = self.selection
        if selection is None:
            selection = "single" if self.algo == "pmp_hmc" else "all_uniform"
        if self.rule is not None and self.algo not in ("mh", "pmp_hmc"):
            # only MH and PMP-HMC have configurable acceptance rules;
            # SP-HMC/MP-HMC rules are fixed by the reference protocol
            # (exp-scaled MH / exp(min(0, dH))) and the RW tree samplers
            # take theirs from selection/stabilizer
            raise ValueError(
                f"rule is not configurable for algo {self.algo!r} "
                "(mh: metropolis|barker; pmp_hmc: barker|mh_clamp|"
                "barker_clamp)"
            )

        if self.algo == "mh":
            rule = self.rule if self.rule is not None else "metropolis"
            if rule not in ("metropolis", "barker"):
                raise ValueError(
                    f"rule {rule!r} is not valid for MH "
                    "(expected 'metropolis' or 'barker')"
                )
            return mh.make_superstep(
                target,
                MHConfig(
                    step_size=self.step_size,
                    rule=rule,
                    proposal=self.proposal,
                ),
            )
        if self.algo == "psp":
            from pmpx.samplers import psp
            from pmpx.samplers.psp import PSPConfig

            return psp.make_superstep(
                target,
                PSPConfig(
                    P=2**self.depth,
                    step_size=self.step_size,
                    trans_sigma=self.trans_sigma,
                    selection=selection,
                    stabilizer=self.stabilizer,
                ),
            )
        if self.algo == "mp":
            return mp.make_superstep(
                target,
                MPConfig(
                    N=self.N,
                    step_size=self.step_size,
                    trans_sigma=self.trans_sigma,
                    selection=selection,
                    stabilizer=self.stabilizer,
                ),
            )
        if self.algo == "pmp":
            return pmp.make_superstep(
                target,
                PMPConfig(
                    N=self.N,
                    depth=self.depth,
                    step_size=self.step_size,
                    trans_sigma=self.trans_sigma,
                    selection=selection,
                    stabilizer=self.stabilizer,
                ),
            )
        if self.algo == "sp_hmc":
            return hmc.make_superstep(
                target,
                HMCConfig(
                    step_size=self.step_size,
                    mom_scale=self.mom_scale,
                    accept_scale=self.accept_scale,
                    num_leapfrog=self.num_leapfrog,
                ),
            )
        if self.algo == "mp_hmc":
            return hmc.make_superstep(
                target,
                MPHMCConfig(
                    N=self.N,
                    step_size=self.step_size,
                    mom_scale=self.mom_scale,
                ),
            )
        if self.algo == "pmp_hmc":
            return hmc.make_superstep(
                target,
                PMPHMCConfig(
                    depth=self.depth,
                    N=self.N,
                    step_size=self.step_size,
                    mom_scale=self.mom_scale,
                    rule=self.rule if self.rule is not None else "barker",
                    stabilizer=self.stabilizer,
                    selection=selection,
                ),
            )
        raise ValueError(f"unknown algo {self.algo!r}")


@dataclasses.dataclass
class RunSpec:
    sampler: SamplerSpec = dataclasses.field(default_factory=SamplerSpec)
    num_steps: int = 1000
    seed: int = 0
    out_dir: str = "results"
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)


def load_spec(path: Optional[str] = None, overrides: Optional[dict] = None) -> RunSpec:
    """Load a RunSpec from a YAML/JSON file with optional dot-key overrides
    (e.g. ``{"sampler.N": 7, "num_steps": 500}``)."""
    raw: Dict[str, Any] = {}
    if path:
        with open(path) as f:
            text = f.read()
        try:
            raw = json.loads(text)
        except json.JSONDecodeError:
            import yaml

            raw = yaml.safe_load(text)
    for k, v in (overrides or {}).items():
        node = raw
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    samp = SamplerSpec(**raw.pop("sampler", {}))
    known = {f.name for f in dataclasses.fields(RunSpec)} - {"sampler", "extra"}
    kw = {k: raw.pop(k) for k in list(raw) if k in known}
    return RunSpec(sampler=samp, extra=raw, **kw)
