from pmpx.kernels.linreg import batched_rss, batched_rss_xla

__all__ = ["batched_rss", "batched_rss_xla"]
