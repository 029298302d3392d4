from pmpx.samplers.base import Target, Tempered, batch_log_prob, run_chain
from pmpx.samplers.pmp import PMPConfig
from pmpx.samplers.mp import MPConfig
from pmpx.samplers.psp import PSPConfig
from pmpx.samplers.mh import MHConfig
from pmpx.samplers.hmc import HMCConfig, MPHMCConfig, PMPHMCConfig

__all__ = [
    "HMCConfig",
    "MPHMCConfig",
    "PMPHMCConfig",
    "Target",
    "Tempered",
    "batch_log_prob",
    "run_chain",
    "PMPConfig",
    "MPConfig",
    "PSPConfig",
    "MHConfig",
]
