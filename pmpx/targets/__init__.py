from pmpx.targets.analytic import Gaussian1D, StandardMVN, Banana

__all__ = ["Gaussian1D", "StandardMVN", "Banana"]
