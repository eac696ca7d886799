"""Scaled Poisson-binomial distribution for probabilistic R*.

The reference returns ``(nclasses // ntest) * PoissonBinomial(p)`` for
probabilistic classifiers (src/rstar.jl:249-265): the distribution of the R*
statistic when each test prediction independently "counts" with its predicted
true-class probability. The pmf is the exact dynamic-programming convolution
in float64.
"""

from __future__ import annotations

import numpy as np


class ScaledPoissonBinomial:
    """Distribution of ``scale * N`` with ``N ~ PoissonBinomial(probs)``.

    ``support`` is ``scale * {0, 1, ..., n}``; ``pdf``/``cdf`` accept values
    on that grid (cdf interpolates as a right-continuous step function).
    """

    def __init__(self, probs, scale: float):
        probs = np.asarray(probs, dtype=np.float64)
        if probs.ndim != 1:
            raise ValueError("probs must be a vector")
        if np.any((probs < 0) | (probs > 1)):
            raise ValueError("probs must lie in [0, 1]")
        self.probs = probs
        self.scale = float(scale)
        self._pmf = _poisson_binomial_pmf(probs)

    @property
    def n(self) -> int:
        return len(self.probs)

    def support(self) -> np.ndarray:
        return self.scale * np.arange(self.n + 1)

    def mean(self) -> float:
        return self.scale * float(np.sum(self.probs))

    def var(self) -> float:
        return self.scale**2 * float(np.sum(self.probs * (1 - self.probs)))

    def std(self) -> float:
        return float(np.sqrt(self.var()))

    def pdf(self, x) -> np.ndarray:
        """pmf at ``x`` (0 off the support grid)."""
        x = np.asarray(x, dtype=np.float64)
        k = np.rint(x / self.scale).astype(int)
        on_grid = np.isclose(k * self.scale, x) & (k >= 0) & (k <= self.n)
        k = np.clip(k, 0, self.n)
        out = np.where(on_grid, self._pmf[k], 0.0)
        return out if out.ndim else float(out)

    def cdf(self, x) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        k = np.floor(x / self.scale + 1e-12).astype(int)
        csum = np.concatenate([[0.0], np.cumsum(self._pmf)])
        k = np.clip(k + 1, 0, self.n + 1)
        out = csum[k]
        return out if out.ndim else float(out)

    def quantile(self, q: float) -> float:
        csum = np.cumsum(self._pmf)
        k = int(np.searchsorted(csum, q))
        return self.scale * min(k, self.n)

    def __repr__(self) -> str:
        return (
            f"ScaledPoissonBinomial(n={self.n}, scale={self.scale:.6g}, "
            f"mean={self.mean():.4f}, std={self.std():.4f})"
        )


def _poisson_binomial_pmf(probs: np.ndarray) -> np.ndarray:
    """Exact DP convolution: O(n^2) float64, vectorized inner updates."""
    n = len(probs)
    pmf = np.zeros(n + 1)
    pmf[0] = 1.0
    for i, p in enumerate(probs):
        pmf[1 : i + 2] = pmf[1 : i + 2] * (1 - p) + pmf[: i + 1] * p
        pmf[0] *= 1 - p
    return pmf
