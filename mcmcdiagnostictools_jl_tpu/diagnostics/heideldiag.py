"""Heidelberger and Welch (1983) stationarity + halfwidth diagnostic.

Mirrors the reference heideldiag.jl: an iterative burn-in scan in steps of
10% of the draws; at each candidate start the Cramer-von Mises statistic of
the Brownian-bridge of cumulative sums is tested via the asymptotic
``pcramer`` series; the halfwidth test compares
``sqrt(2) * erfcinv(alpha) * mcse`` against ``eps * |mean|``
(src/heideldiag.jl:16-68).

The burn-in scan is the reference's data-dependent while loop (at most ~5
candidates); it runs host-side with the Cramer-von Mises p-value evaluated by
the device-side ``pcramer`` — this is a per-chain scalar path, not the
throughput path (SURVEY.md section 7 "Hard parts").
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
from scipy.special import erfcinv  # host-side scalar constant only

from ..ops.special import pcramer
from .mcse import mcse


class HeidelResult(NamedTuple):
    burnin: int
    stationarity: bool
    pvalue: float
    mean: float
    halfwidth: float
    test: bool


def heideldiag(x, *, alpha: float = 0.05, eps: float = 0.1, start: int = 1,
               **mcse_kwargs):
    """Heidelberger-Welch diagnostic of ``x`` shaped
    ``(draws[, chains[, params...]])``.

    Returns ``(burnin, stationarity, pvalue, mean, halfwidth, test)``;
    ``start`` offsets the reported burn-in index (1-based, like the
    reference). 1-d input reproduces the reference scalar loop
    (src/heideldiag.jl:16) bit-for-bit; N-d input dispatches every
    (chain, parameter) series through the fused batched scan kernel
    (diagnostics/batch.py) and returns arrays shaped ``(chains, *params)``.
    ``mcse_kwargs`` are forwarded to :func:`mcse`.
    """
    x = np.asarray(x, dtype=float)
    if x.ndim != 1:
        from .batch import heideldiag_batch

        return heideldiag_batch(x, alpha=alpha, eps=eps, start=start,
                                **mcse_kwargs)
    n = len(x)
    delta = int(0.10 * n)
    y = x[int(n / 2) - 1 :]

    def _mcse_vec(v):
        return float(np.asarray(mcse(v.reshape(-1, 1, 1), split_chains=1,
                                     **mcse_kwargs))[0])

    s = _mcse_vec(y)
    s0 = len(y) * s**2

    # candidate starts i = 1, 1+delta, ... while i < n/2 (1-based)
    i = 1
    pvalue, converged, ybar = 1.0, False, float("nan")
    while i < n / 2:
        y = x[i - 1 :]
        m = len(y)
        ybar = float(np.mean(y))
        b = np.cumsum(y) - ybar * np.arange(1, m + 1)
        bsq = (b * b) / (m * s0)
        cvm = float(np.sum(bsq) / m)
        pvalue = 1.0 - float(np.asarray(pcramer(cvm)))
        converged = pvalue > alpha
        if converged:
            break
        i += delta
    s = _mcse_vec(y)
    halfwidth = math.sqrt(2.0) * float(erfcinv(alpha)) * s
    passed = halfwidth / abs(ybar) <= eps
    return HeidelResult(
        burnin=i + start - 2,
        stationarity=bool(converged),
        pvalue=pvalue,
        mean=ybar,
        halfwidth=halfwidth,
        test=bool(passed),
    )
