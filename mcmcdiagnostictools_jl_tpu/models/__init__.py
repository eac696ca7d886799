from .gbt import GBTClassifier, GBTState, deterministic
from .poisson_binomial import ScaledPoissonBinomial
from .hmc import HMCTrace, cauchy_logpdf, eight_schools_logpdf, hmc_sample

__all__ = [
    "GBTClassifier",
    "GBTState",
    "deterministic",
    "ScaledPoissonBinomial",
    "HMCTrace",
    "hmc_sample",
    "cauchy_logpdf",
    "eight_schools_logpdf",
]
