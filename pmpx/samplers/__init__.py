from pmpx.samplers.base import Target, Tempered, batch_log_prob, run_chain
from pmpx.samplers.pmp import PMPConfig
from pmpx.samplers.mp import MPConfig
from pmpx.samplers.mh import MHConfig

__all__ = [
    "Target",
    "Tempered",
    "batch_log_prob",
    "run_chain",
    "PMPConfig",
    "MPConfig",
    "MHConfig",
]
