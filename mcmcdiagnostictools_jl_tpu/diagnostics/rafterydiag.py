"""Raftery and Lewis (1992) run-length diagnostic.

Mirrors the reference rafterydiag.jl: dichotomize the chain at the target
quantile ``q``, find the smallest thinning ``kthin`` whose thinned indicator
passes a second-order-Markov BIC test, then size burn-in and run length from
the 2-state transition probabilities (src/rafterydiag.jl:27-74).

Host-side NumPy by design: the BIC loop over thinning factors is a small
data-dependent scalar computation on a 0/1 vector — not the throughput path.
"""

from __future__ import annotations

import math
import warnings
from typing import NamedTuple

import numpy as np
from scipy.special import erfinv  # host-side scalar constant only


class RafteryResult(NamedTuple):
    thinning: float
    burnin: float
    total: float
    nmin: int
    dependencefactor: float


def rafterydiag(
    x, *, q: float = 0.025, r: float = 0.005, s: float = 0.95, eps: float = 0.001,
    range_start: int = 1, range_step: int = 1,
):
    """Raftery-Lewis diagnostic of ``x`` shaped
    ``(draws[, chains[, params...]])``.

    ``range_start``/``range_step`` describe the iteration numbering of ``x``
    (the reference's ``range`` keyword, default ``1:length(x)``). 1-d input
    reproduces the reference scalar loop (src/rafterydiag.jl:27)
    bit-for-bit; N-d input dispatches every (chain, parameter) series
    through the vectorized batch path (diagnostics/batch.py) and returns a
    result of arrays shaped ``(chains, *params)``.
    """
    x = np.asarray(x, dtype=float)
    if x.ndim != 1:
        from .batch import rafterydiag_batch

        return rafterydiag_batch(x, q=q, r=r, s=s, eps=eps,
                                 range_start=range_start,
                                 range_step=range_step)
    nx = len(x)
    phi = math.sqrt(2.0) * float(erfinv(s))
    nmin = math.ceil(q * (1.0 - q) * (phi / r) ** 2)
    if nmin > nx:
        warnings.warn(f"At least {nmin} samples are needed for specified q, r, and s")
        return RafteryResult(-1, float("nan"), float("nan"), nmin, float("nan"))

    dichot = (x <= np.quantile(x, q)).astype(np.int64)
    kthin = 0
    bic = 1.0
    test = ntest = None
    while bic >= 0.0:
        kthin += 1
        test = dichot[::kthin]
        ntest = len(test)
        # 3-step patterns: value = t0 + 2*t1 + 4*t2
        temp = test[: ntest - 2] + 2 * test[1 : ntest - 1] + 4 * test[2:ntest]
        trantest = np.bincount(temp, minlength=8).reshape(2, 2, 2, order="F")
        g2 = 0.0
        for i1 in range(2):
            for i2 in range(2):
                for i3 in range(2):
                    tt = trantest[i1, i2, i3]
                    if tt > 0:
                        fitted = (
                            trantest[:, i2, i3].sum()
                            * trantest[i1, i2, :].sum()
                            / trantest[:, i2, :].sum()
                        )
                        g2 += 2.0 * tt * math.log(tt / fitted)
        bic = g2 - 2.0 * math.log(ntest - 2.0)

    tranfinal = np.bincount(test[: ntest - 1] + 2 * test[1:ntest], minlength=4)
    alpha = tranfinal[2] / (tranfinal[0] + tranfinal[2])
    beta = tranfinal[1] / (tranfinal[1] + tranfinal[3])
    kthin *= range_step
    m = math.log(eps * (alpha + beta) / max(alpha, beta)) / math.log(
        abs(1.0 - alpha - beta)
    )
    burnin = kthin * math.ceil(m) + range_start - 1
    n = ((2.0 - alpha - beta) * alpha * beta * phi**2) / (r**2 * (alpha + beta) ** 3)
    keep = kthin * math.ceil(n)
    total = burnin + keep
    return RafteryResult(kthin, burnin, total, nmin, total / nmin)
