from .gbt import GBTClassifier, GBTState, deterministic
from .poisson_binomial import ScaledPoissonBinomial

__all__ = ["GBTClassifier", "GBTState", "deterministic", "ScaledPoissonBinomial"]
