from pmpx.metrics.analysis import (
    first_crossing,
    iteration_speedup,
    smooth_loss,
)
from pmpx.metrics.ess import (
    autocov, autocov_chunked, ess, ess_chunked, ess_per_dim, split_rhat,
)
from pmpx.metrics.mixing import move_rate, msjd, skewness
from pmpx.metrics.recorder import (
    load_trace,
    reference_style_name,
    save_trace,
)

__all__ = [
    "first_crossing",
    "iteration_speedup",
    "smooth_loss",
    "autocov",
    "autocov_chunked",
    "ess_chunked",
    "ess",
    "ess_per_dim",
    "split_rhat",
    "move_rate",
    "msjd",
    "skewness",
    "load_trace",
    "reference_style_name",
    "save_trace",
]
