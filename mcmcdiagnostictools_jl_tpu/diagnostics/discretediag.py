"""Convergence diagnostics for discrete (categorical) chains.

Re-derivation of the reference discretediag.jl (Deonovic & Smith 2017):
between-chain and within-chain tests for samples of a categorical variable,
with six methods:

- ``"hangartner"`` — chi^2 test of per-chain category frequencies
  (src/discretediag.jl:302-307)
- ``"weiss"`` — Hangartner chi^2 with a serial-dependence correction
  ``c = (1+phi)/(1-phi)`` (src/discretediag.jl:80-119,308-314)
- ``"DARBOOT"`` — parametric bootstrap of a DAR(1) process
  (src/discretediag.jl:187-228,315-328)
- ``"MCBOOT"`` — Markov-chain bootstrap (src/discretediag.jl:230-238,329-337)
- ``"billingsley"`` — transition-matrix chi^2 (src/discretediag.jl:130-173)
- ``"billingsleyBOOT"`` — its Markov-chain bootstrap
  (src/discretediag.jl:344-356)

Counting kernels (category counts, self-transition counts, transition
tensors) and all bootstrap replicas are fully vectorized over simulations —
the reference's per-draw dictionary scan becomes one-hot reductions. The
statistics faithfully reproduce the reference's conventions, including its
time-reversed transition tensor in the diag_all path (``f[to, from, chain]``,
src/discretediag.jl:283-284) and MCBOOT's NaN statistic / 0.0 p-value
(``stat`` is never assigned in the :MCBOOT branch, src/discretediag.jl:329-337).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from scipy.stats import chi2 as _chi2

_METHODS = ("weiss", "hangartner", "DARBOOT", "MCBOOT", "billingsley",
            "billingsleyBOOT")


class DiscreteDiagValues(NamedTuple):
    stat: np.ndarray
    df: np.ndarray
    pvalue: np.ndarray


class DiscreteDiagResult(NamedTuple):
    between_chain: DiscreteDiagValues
    within_chain: DiscreteDiagValues


def discretediag(chains, *, frac: float = 0.3, method: str = "weiss",
                 nsim: int = 1000, rng=None) -> DiscreteDiagResult:
    """Discrete diagnostic on ``chains`` of shape (draws, chains, parameters).

    Returns between-chain values (per parameter) and within-chain values
    (parameters x chains) comparing the first ``frac`` draws against the last
    ``frac`` within each chain (src/discretediag.jl:399-424). ``rng`` seeds
    the bootstrap methods (NumPy Generator or seed).
    """
    if method not in _METHODS:
        raise ValueError(
            "`method` must be one of :" + ", :".join(_METHODS)
        )
    if not 0 < frac < 1:
        raise ValueError("`frac` must be in (0,1)")
    x = np.asarray(chains)
    if x.ndim != 3:
        raise ValueError("samples must have shape (draws, chains, parameters)")
    rng = np.random.default_rng(rng)
    num_iters, num_chains, num_vars = x.shape

    b_stat = np.empty(num_vars)
    b_df = np.empty(num_vars)
    b_pval = np.empty(num_vars)
    w_stat = np.empty((num_vars, num_chains))
    w_df = np.empty((num_vars, num_chains))
    w_pval = np.empty((num_vars, num_chains))

    for j in range(num_vars):
        codes, m = _integer_codes(x[:, :, j])
        s, d, p = _diag_full(codes, m, method, nsim, rng)
        b_stat[j], b_df[j], b_pval[j] = s, d, p

        n1 = round(frac * num_iters)
        start2 = round(num_iters - frac * num_iters + 1) - 1
        for k in range(num_chains):
            xk = codes[:, k]
            x1 = xk[:n1]
            x2 = xk[start2:]
            n_min = min(len(x1), len(x2))
            y = np.stack([x1[:n_min], x2[len(x2) - n_min :]], axis=1)
            s, d, p = _diag_full(y, m, method, nsim, rng)
            w_stat[j, k], w_df[j, k], w_pval[j, k] = s, d, p

    return DiscreteDiagResult(
        DiscreteDiagValues(b_stat, b_df, b_pval),
        DiscreteDiagValues(w_stat, w_df, w_pval),
    )


# ---------------------------------------------------------------------------
# counting kernels
# ---------------------------------------------------------------------------


def _integer_codes(x):
    """Map values to codes 0..m-1 (category labeling does not affect any of
    the statistics, so sorted-unique codes replace the reference's
    first-appearance dict, src/discretediag.jl:246-289)."""
    uniq, codes = np.unique(x, return_inverse=True)
    return codes.reshape(x.shape), len(uniq)


def _counts_u(y, m):
    """u[j, c] = occurrences of category j in chain c. y: (n, d) codes."""
    n, d = y.shape
    u = np.zeros((m, d), dtype=np.int64)
    for j in range(m):
        u[j] = (y == j).sum(axis=0)
    return u


def _counts_v(y, m):
    """v[j, c] = self-transitions into category j in chain c."""
    same = y[1:] == y[:-1]
    v = np.zeros((m, y.shape[1]), dtype=np.int64)
    for j in range(m):
        v[j] = ((y[1:] == j) & same).sum(axis=0)
    return v


def _counts_f_reversed(y, m):
    """f[to, from, c] transition tensor — the diag_all orientation
    (src/discretediag.jl:283-284)."""
    n, d = y.shape
    f = np.zeros((m, m, d), dtype=np.int64)
    pair = y[1:] * m + y[:-1]  # to * m + from
    for c in range(d):
        f[:, :, c] = np.bincount(pair[:, c], minlength=m * m).reshape(m, m)
    return f


# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------


def _weiss_sub(u, v, t):
    """(phi_hat, per-chain chi^2 contributions, #nonempty categories)
    (src/discretediag.jl:80-119). Supports leading batch dims on u/v."""
    m, d = u.shape[-2], u.shape[-1]
    p1 = v.sum(axis=-1) / (d * (t - 1))  # (..., m)
    p2 = u.sum(axis=-1) / (d * t)
    nt = p1.sum(axis=-1)
    dt_ = (p2**2).sum(axis=-1)
    mp = u / t  # (..., m, d)
    ma = u.sum(axis=-1) / (d * t)  # (..., m)
    nonempty = ma > 0
    m_tot = nonempty.sum(axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        contrib = (mp - ma[..., None]) ** 2 / ma[..., None]
    contrib = np.where(nonempty[..., None], contrib, 0.0)
    chi_stat = contrib.sum(axis=-2)  # (..., d)
    with np.errstate(divide="ignore", invalid="ignore"):
        phia = 1.0 + 1.0 / t - (1.0 - nt) / (1.0 - dt_)
    phia = np.clip(phia, 0.0, 1.0 - np.finfo(float).eps)
    return phia, chi_stat, m_tot


def _hangartner_stat(u, t):
    """n * sum of chi^2 contributions — hangartner_inner without the
    self-transition counts (src/discretediag.jl:9-24). Batch-safe."""
    v = np.zeros_like(u)
    _, chi_stat, m_tot = _weiss_sub(u, v, t)
    return t * chi_stat.sum(axis=-1), m_tot


def _billingsley_sub(f):
    """Transition chi^2 statistic + df + pooled transition matrix
    (src/discretediag.jl:130-173). Supports leading batch dims."""
    m, d = f.shape[-3], f.shape[-1]
    mf = f.sum(axis=-2)  # (..., m, d) outgoing totals per category/chain
    a = (mf > 0).sum(axis=-1)  # (..., m) chains where category occurs
    b = (f.sum(axis=-1) > 0).sum(axis=-1)  # (..., m) distinct successors
    with np.errstate(divide="ignore", invalid="ignore"):
        p = f / mf[..., :, None, :]  # per-chain transition probs
        mp = f.sum(axis=-1) / mf.sum(axis=-1)[..., :, None]
    mp = np.nan_to_num(mp, nan=0.0)
    active = (a * b) > 0  # (..., m)
    df = np.where(active, (a - 1) * (b - 1), 0).sum(axis=-1).astype(float)

    mask = (
        active[..., :, None, None]
        & active[..., None, :, None]
        & (mp[..., :, :, None] > 0)
        & (mf[..., :, None, :] > 0)
        & np.isfinite(p)
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = mf[..., :, None, :] * (p - mp[..., :, :, None]) ** 2 / mp[..., :, :, None]
    stat = np.where(mask, terms, 0.0).sum(axis=(-3, -2, -1))
    return stat, df, mp


# ---------------------------------------------------------------------------
# bootstrap simulators (vectorized over nsim)
# ---------------------------------------------------------------------------


def _simulate_dar1(nsim, n, d, phi, probs, rng):
    """DAR(1): X_t = X_{t-1} w.p. phi else fresh draw from Categorical(probs)
    (src/discretediag.jl:187-228). Returns (nsim, n, d) codes."""
    m = len(probs)
    fresh = rng.choice(m, size=(nsim, n, d), p=probs)
    keep = rng.random(size=(nsim, n, d)) <= phi
    out = np.empty((nsim, n, d), dtype=np.int64)
    out[:, 0] = fresh[:, 0]
    for t in range(1, n):
        out[:, t] = np.where(keep[:, t], out[:, t - 1], fresh[:, t])
    return out


def _simulate_mc(nsim, n, d, mp, rng):
    """Markov chains from transition matrix ``mp`` with uniform starts
    (src/discretediag.jl:230-238). Rows that sum to zero hold their state.
    Returns (nsim, n, d) codes."""
    m = mp.shape[0]
    rowsum = mp.sum(axis=1, keepdims=True)
    safe = np.where(rowsum > 0, mp / np.where(rowsum > 0, rowsum, 1.0), 0.0)
    cdf = np.cumsum(safe, axis=1)
    zero_row = (rowsum[:, 0] == 0)
    out = np.empty((nsim, n, d), dtype=np.int64)
    out[:, 0] = rng.integers(0, m, size=(nsim, d))
    unif = rng.random(size=(nsim, n, d))
    for t in range(1, n):
        prev = out[:, t - 1]
        nxt = (unif[:, t][..., None] > cdf[prev]).sum(axis=-1)
        out[:, t] = np.where(zero_row[prev], prev, np.minimum(nxt, m - 1))
    return out


def _batch_counts_u(y, m):
    """u over batch: y (nsim, n, d) -> (nsim, m, d)."""
    nsim, n, d = y.shape
    u = np.zeros((nsim, m, d), dtype=np.int64)
    for j in range(m):
        u[:, j, :] = (y == j).sum(axis=1)
    return u


def _batch_counts_f(y, m):
    """(from, to) transition tensors over batch: (nsim, m, m, d)."""
    nsim, n, d = y.shape
    pair = y[:, :-1] * m + y[:, 1:]  # from * m + to
    offs = (np.arange(nsim)[:, None, None] * d + np.arange(d)[None, None, :]) * (m * m)
    counts = np.bincount((pair + offs).reshape(-1), minlength=nsim * d * m * m)
    return counts.reshape(nsim, d, m, m).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# full-length evaluation (the reference's diag_all at t = n)
# ---------------------------------------------------------------------------


def _diag_full(y, m, method, nsim, rng):
    """stat/df/pvalue at full length for codes ``y`` (n, d)
    (src/discretediag.jl:240-366 with start_iter=n)."""
    n, d = y.shape
    u = _counts_u(y, m)
    v = _counts_v(y, m)
    f = _counts_f_reversed(y, m)

    phia, chi_stat, m_tot = _weiss_sub(u, v, n)
    hot_stat, bdf, mp = _billingsley_sub(f)
    phat = u.sum(axis=1) / u.sum()
    ca = (1 + phia) / (1 - phia)

    stat = df0 = pval = np.nan
    if method == "hangartner":
        stat = n * chi_stat.sum()
        df0 = (m - 1) * (d - 1)
        if m > 1 and not np.isnan(stat):
            pval = float(_chi2.sf(stat, df0))
    elif method == "weiss":
        stat = (n / ca) * chi_stat.sum()
        df0 = (m - 1) * (d - 1)
        if m > 1 and not np.isnan(stat):
            pval = float(_chi2.sf(stat, df0))
    elif method == "DARBOOT":
        stat = n * chi_stat.sum()
        sims = _simulate_dar1(nsim, n, d, phia, phat, rng)
        bstats, _ = _hangartner_stat(_batch_counts_u(sims, m), n)
        bstats = bstats[~np.isnan(bstats)]
        df0 = float(np.mean(bstats))
        pval = float(np.mean(stat <= bstats))
    elif method == "MCBOOT":
        sims = _simulate_mc(nsim, n, d, mp, rng)
        bstats, _ = _hangartner_stat(_batch_counts_u(sims, m), n)
        bstats = bstats[~np.isnan(bstats)]
        df0 = float(np.mean(bstats))
        # reference quirk: `stat` is never assigned in the :MCBOOT branch, so
        # the reported statistic is NaN and `mean(NaN <= x)` is 0.0
        # (src/discretediag.jl:329-337)
        pval = float(np.mean(stat <= bstats))
    elif method == "billingsley":
        stat = hot_stat
        df0 = bdf
        if bdf > 0 and not np.isnan(hot_stat):
            pval = float(_chi2.sf(stat, bdf))
    elif method == "billingsleyBOOT":
        stat = hot_stat
        sims = _simulate_mc(nsim, n, d, mp, rng)
        fb = _batch_counts_f(sims, m)  # (from, to) orientation, bd_inner-style
        s_b, d_b, _ = _billingsley_sub(fb)
        with np.errstate(divide="ignore", invalid="ignore"):
            bstats = s_b / d_b
        bstats = bstats[~np.isnan(bstats)]
        df0 = float(np.mean(bstats))
        statodf = stat / bdf
        pval = float(np.mean(statodf <= bstats))
    return float(stat), float(df0), float(pval)
