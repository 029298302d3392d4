"""pmpx — TPU-native prefetching multiple-proposal MCMC framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
guifengye1/PMP-MCMC: SP/MH, MP (generalized multiple-try Metropolis), PSP and
PMP (prefetching speculation trees), with random-walk and HMC-leapfrog
proposal flavors, over analytic targets, Bayesian linear regression, and
neural-network posteriors — all as pure jittable supersteps scanned
on-device, sharded over TPU meshes for chain/data/tree parallelism.
"""

from pmpx import tree
from pmpx.transition import GaussianRW
from pmpx.samplers.base import Target, Tempered, batch_log_prob, run_chain
from pmpx.samplers.pmp import PMPConfig
from pmpx.samplers.mp import MPConfig
from pmpx.samplers.mh import MHConfig
from pmpx.samplers.hmc import HMCConfig, MPHMCConfig, PMPHMCConfig
from pmpx.config import RunSpec, SamplerSpec, load_spec

__version__ = "0.1.0"

__all__ = [
    "tree",
    "GaussianRW",
    "Target",
    "Tempered",
    "batch_log_prob",
    "run_chain",
    "PMPConfig",
    "MPConfig",
    "MHConfig",
    "HMCConfig",
    "MPHMCConfig",
    "PMPHMCConfig",
    "RunSpec",
    "SamplerSpec",
    "load_spec",
]
