"""Independent NumPy float64 oracle for parity tests.

This is a deliberately loop-based, per-parameter re-derivation of the
algorithms from Vehtari et al. (2021) / Geyer (1992) / Margossian et al.
(2024) following the reference's documented numeric conventions
(see SURVEY.md section 2). It shares no code with the JAX implementation —
the JAX kernels are validated against this oracle to 1e-6 or better.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import rankdata
from scipy.special import ndtri


# ---------------------------------------------------------------------------
# layout / splitting
# ---------------------------------------------------------------------------


def split_matrix(x: np.ndarray, split: int) -> np.ndarray:
    """Split (draws, chains) into (draws//split, split*chains), chain-major,
    discarding one draw after each of the first draws%split splits."""
    ndraws, nchains = x.shape
    niter = ndraws // split
    d = ndraws % split
    cols = []
    for c in range(nchains):
        for k in range(split):
            start = k * niter + min(k, d)
            cols.append(x[start : start + niter, c])
    return np.stack(cols, axis=1)


def params_iter(x: np.ndarray):
    """Yield (index, (draws, chains) slice) over flattened parameter dims."""
    if x.ndim == 1:
        yield 0, x[:, None]
        return
    flat = x.reshape(x.shape[0], x.shape[1], -1)
    for p in range(flat.shape[2]):
        yield p, flat[:, :, p]


def out_shape(x: np.ndarray):
    return x.shape[2:] if x.ndim > 2 else ()


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def rank_normalize(x: np.ndarray) -> np.ndarray:
    y = np.empty_like(np.asarray(x, dtype=np.float64))
    if x.ndim == 1:
        r = rankdata(x, method="average")
        return ndtri((r - 0.375) / (len(x) + 0.25))
    yf = y.reshape(y.shape[0], y.shape[1], -1)
    for p, xs in params_iter(x):
        flat = xs.reshape(-1, order="F")  # column-major like Julia vec
        r = rankdata(flat, method="average")
        z = ndtri((r - 0.375) / (len(flat) + 0.25))
        yf[:, :, p] = z.reshape(xs.shape, order="F")
    return y


def fold_around_median(x: np.ndarray) -> np.ndarray:
    y = np.empty_like(np.asarray(x, dtype=np.float64))
    if x.ndim == 1:
        return np.abs(x - np.median(x))
    yf = y.reshape(y.shape[0], y.shape[1], -1)
    for p, xs in params_iter(x):
        yf[:, :, p] = np.abs(xs - np.median(xs))
    return y


# ---------------------------------------------------------------------------
# autocovariance + Geyer ESS (sequential, matching reference semantics)
# ---------------------------------------------------------------------------


def _fft_autocov_table(samples: np.ndarray) -> np.ndarray:
    """Unnormalized autocovariance sum_i x_i x_{i+k} per chain via FFT.
    samples: (niter, nchains) centered. Returns (niter, nchains)."""
    niter, nchains = samples.shape
    n = 2 * niter  # any size >= 2*niter - 1 works for the linear correlation
    f = np.fft.rfft(samples, n=n, axis=0)
    c = np.fft.irfft(np.abs(f) ** 2, n=n, axis=0)
    return c[:niter]


def _mean_autocov(k: int, table: np.ndarray, chain_var: np.ndarray, niter: int):
    ratio = table[k] / table[0]
    return np.mean(ratio * chain_var) * (niter - 1) / niter


def ess_rhat_basic(
    x: np.ndarray,
    split_chains: int = 2,
    maxlag: int = 250,
    relative: bool = False,
):
    """Per-parameter sequential Geyer ESS + split R-hat. x: (draws, chains[, ...])."""
    shp = out_shape(x)
    nparam = int(np.prod(shp)) if shp else 1
    ess = np.full(nparam, np.nan)
    rh = np.full(nparam, np.nan)
    for p, xs in params_iter(np.asarray(x, dtype=np.float64)):
        samples = split_matrix(xs, split_chains)
        niter, nchains = samples.shape
        ntotal = niter * nchains
        lag_cap = min(maxlag, niter - 4)
        chain_mean = samples.mean(axis=0)
        chain_var = samples.var(axis=0, ddof=1)
        w = chain_var.mean()
        between = chain_mean.var(ddof=1) if nchains > 1 else 0.0
        var_plus = (niter - 1) / niter * w + between
        rh[p] = np.sqrt(var_plus / w)
        if niter <= 4:
            continue
        centered = samples - chain_mean
        table = _fft_autocov_table(centered)
        inv_vp = 1.0 / var_plus

        rho_odd = 1 - inv_vp * (w - _mean_autocov(1, table, chain_var, niter))
        p_t = 1.0 + rho_odd
        sum_p = p_t
        k = 2
        while k < lag_cap - 1:
            rho_even = 1 - inv_vp * (w - _mean_autocov(k, table, chain_var, niter))
            rho_odd = 1 - inv_vp * (w - _mean_autocov(k + 1, table, chain_var, niter))
            delta = rho_even + rho_odd
            if not delta > 0:
                break
            p_t = min(delta, p_t)
            sum_p += p_t
            k += 2
        if lag_cap > 1:
            rho_even = 1 - inv_vp * (w - _mean_autocov(k, table, chain_var, niter))
        else:
            rho_even = 0.0
        tau = max(0.0, 2 * sum_p + max(0.0, rho_even) - 1)
        with np.errstate(divide="ignore"):
            e = min(1.0 / tau if tau > 0 else np.inf, np.log10(ntotal))
        ess[p] = e if relative else e * ntotal
    return ess.reshape(shp) if shp else ess[0], rh.reshape(shp) if shp else rh[0]


def rhat_basic(x: np.ndarray, split_chains: int = 2):
    shp = out_shape(x)
    nparam = int(np.prod(shp)) if shp else 1
    rh = np.full(nparam, np.nan)
    for p, xs in params_iter(np.asarray(x, dtype=np.float64)):
        samples = split_matrix(xs, split_chains)
        niter, nchains = samples.shape
        chain_mean = samples.mean(axis=0)
        chain_var = samples.var(axis=0, ddof=1)
        w = chain_var.mean()
        between = chain_mean.var(ddof=1) if nchains > 1 else 0.0
        var_plus = (niter - 1) / niter * w + between
        rh[p] = np.sqrt(var_plus / w)
    return rh.reshape(shp) if shp else rh[0]


# ---------------------------------------------------------------------------
# kinds / proxies
# ---------------------------------------------------------------------------


def _quantile_proxy(x: np.ndarray, prob: float) -> np.ndarray:
    y = np.empty(np.asarray(x).shape, dtype=np.float64)
    if x.ndim == 1:
        return (x <= np.quantile(x, prob)).astype(np.float64)
    yf = y.reshape(y.shape[0], y.shape[1], -1)
    for p, xs in params_iter(x):
        yf[:, :, p] = (xs <= np.quantile(xs, prob)).astype(np.float64)
    return y


def _median_proxy(x: np.ndarray) -> np.ndarray:
    return _quantile_proxy(x, 0.5)


def expectand_proxy(kind, x: np.ndarray, q: float | None = None) -> np.ndarray:
    if kind == "mean":
        return np.asarray(x, dtype=np.float64)
    if kind == "median":
        return _median_proxy(x)
    if kind == "std":
        dims = (0,) if x.ndim == 1 else (0, 1)
        return (x - x.mean(axis=dims, keepdims=True)) ** 2
    if kind == "mad":
        return _median_proxy(fold_around_median(x))
    if kind == "quantile":
        return _quantile_proxy(x, q)
    raise ValueError(kind)


def ess(x, kind="bulk", relative=False, split_chains=2, maxlag=250, tail_prob=0.1,
        q=None):
    if kind == "bulk":
        return ess_rhat_basic(rank_normalize(x), split_chains, maxlag, relative)[0]
    if kind == "basic":
        return ess_rhat_basic(x, split_chains, maxlag, relative)[0]
    if kind == "tail":
        lo = ess(x, kind="quantile", q=tail_prob / 2, relative=relative,
                 split_chains=split_chains, maxlag=maxlag)
        hi = ess(x, kind="quantile", q=1 - tail_prob / 2, relative=relative,
                 split_chains=split_chains, maxlag=maxlag)
        return np.minimum(lo, hi)
    proxy = expectand_proxy(kind, np.asarray(x, dtype=np.float64), q)
    return ess_rhat_basic(proxy, split_chains, maxlag, relative)[0]


def rhat(x, kind="rank", split_chains=2):
    if kind == "basic":
        return rhat_basic(x, split_chains)
    if kind == "bulk":
        return rhat_basic(rank_normalize(x), split_chains)
    if kind == "tail":
        return rhat_basic(rank_normalize(fold_around_median(x)), split_chains)
    if kind == "rank":
        return np.maximum(rhat(x, "bulk", split_chains), rhat(x, "tail", split_chains))
    raise ValueError(kind)


def ess_rhat(x, kind="rank", split_chains=2, maxlag=250, relative=False):
    if kind in ("basic", "bulk"):
        y = rank_normalize(x) if kind == "bulk" else x
        return ess_rhat_basic(y, split_chains, maxlag, relative)
    if kind == "tail":
        return (
            ess(x, "tail", relative, split_chains, maxlag),
            rhat(x, "tail", split_chains),
        )
    if kind == "rank":
        e, rb = ess_rhat(x, "bulk", split_chains, maxlag, relative)
        rt = rhat(x, "tail", split_chains)
        return e, np.maximum(rb, rt)
    raise ValueError(kind)


def ar1_matrix(rng, phi: float, sigma: float, size) -> np.ndarray:
    """AR(1) process along axis 0 (test fixture, cf. reference test/helpers.jl:4-12)."""
    noise = rng.standard_normal(size)
    out = np.empty(size)
    out[0] = noise[0]
    for t in range(1, size[0]):
        out[t] = phi * out[t - 1] + sigma * noise[t]
    return out


# ---------------------------------------------------------------------------
# mcse (oracle)
# ---------------------------------------------------------------------------

_NORMCDF1 = 0.8413447460685429
_NORMCDFN1 = 0.15865525393145705


def mcse_mean(x, **kw):
    s = ess(x, kind="mean", **kw)
    dims = (0,) if x.ndim == 1 else (0, 1)
    return x.std(axis=dims, ddof=1) / np.sqrt(s)


def mcse_std(x, **kw):
    dims = (0,) if x.ndim == 1 else (0, 1)
    x2 = (x - x.mean(axis=dims, keepdims=True)) ** 2
    s = ess(x2, kind="mean", **kw)
    mv = x2.mean(axis=dims)
    m4 = (x2**2).mean(axis=dims)
    return np.sqrt((m4 / mv - mv) / s) / 2


def _mcse_quantile_scalar(flat, p, seff):
    from scipy.special import betaincinv as betaincinv_
    if np.isnan(seff):
        return np.nan
    n = len(flat)
    a = seff * p + 1
    b = seff * (1 - p) + 1
    pu = betaincinv_(a, b, _NORMCDF1)
    pl = betaincinv_(a, b, _NORMCDFN1)
    l = int(max(np.floor(pl * n), 1))
    u = int(min(np.ceil(pu * n), n))
    xs = np.sort(flat)
    return (xs[u - 1] - xs[l - 1]) / 2


def mcse_quantile(x, p, **kw):
    s = ess(x, kind="quantile", q=p, **kw)
    if x.ndim < 3:
        return _mcse_quantile_scalar(np.asarray(x, float).reshape(-1), p, float(s))
    shp = out_shape(x)
    s_flat = np.asarray(s).reshape(-1)
    vals = np.empty(s_flat.shape)
    for pi, xs in params_iter(np.asarray(x, float)):
        vals[pi] = _mcse_quantile_scalar(xs.reshape(-1, order="F"), p, s_flat[pi])
    return vals.reshape(shp)


def mcse_sbm(x, f, batch_size=None):
    def one(flat):
        n = len(flat)
        b = int(np.floor(np.sqrt(n))) if batch_size is None else batch_size
        if np.all(flat == flat[0]):
            return np.nan
        vals = np.array([f(flat[i : i + b]) for i in range(n - b + 1)])
        return np.sqrt(vals.var(ddof=0) * (b / n))

    if x.ndim < 3:
        return one(np.asarray(x, float).reshape(-1, order="F"))
    shp = out_shape(x)
    vals = np.empty(int(np.prod(shp)))
    for pi, xs in params_iter(np.asarray(x, float)):
        vals[pi] = one(xs.reshape(-1, order="F"))
    return vals.reshape(shp)


# ---------------------------------------------------------------------------
# nested rhat (oracle)
# ---------------------------------------------------------------------------


def rhat_nested_basic(x, superchain_ids, split_chains=2):
    ids = np.asarray(superchain_ids)
    uniq = np.unique(ids)
    shp = out_shape(x)
    nparam = int(np.prod(shp)) if shp else 1
    rh = np.full(nparam, np.nan)
    for pidx, xs in params_iter(np.asarray(x, float)):
        var_within = 0.0
        sc_means = []
        for u in uniq:
            cols = np.flatnonzero(ids == u)
            samples = split_matrix(xs[:, cols], split_chains)
            m = samples.shape[1]
            cm = samples.mean(axis=0)
            cv = samples.var(axis=0, ddof=1)
            wk = cv.mean()
            bk = cm.var(ddof=1) if m > 1 else 0.0
            sc_means.append(cm.mean())
            var_within += wk + bk
        var_within /= len(uniq)
        var_between = np.var(sc_means, ddof=1)
        rh[pidx] = np.sqrt(1 + var_between / var_within)
    return rh.reshape(shp) if shp else rh[0]


def rhat_nested(x, superchain_ids, kind="rank", split_chains=2):
    if kind == "basic":
        return rhat_nested_basic(x, superchain_ids, split_chains)
    if kind == "bulk":
        return rhat_nested_basic(rank_normalize(x), superchain_ids, split_chains)
    if kind == "tail":
        return rhat_nested_basic(
            rank_normalize(fold_around_median(x)), superchain_ids, split_chains
        )
    if kind == "rank":
        return np.maximum(
            rhat_nested(x, superchain_ids, "bulk", split_chains),
            rhat_nested(x, superchain_ids, "tail", split_chains),
        )
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# Gelman-Rubin-Brooks PSRF (oracle)
# ---------------------------------------------------------------------------


def gelmandiag(psi, alpha=0.05):
    """Brooks & Gelman (1998) corrected PSRF with F-based upper CI."""
    from scipy import stats as spstats

    psi = np.asarray(psi, float)
    niters, nchains, nparams = psi.shape
    rfixed = (niters - 1) / niters
    rrandomscale = (nchains + 1) / (nchains * niters)

    s2_list = [np.cov(psi[:, i, :], rowvar=False, ddof=1).reshape(nparams, nparams)
               for i in range(nchains)]
    w_full = np.mean(s2_list, axis=0)
    psibar = psi.mean(axis=0)  # (C, P)
    b_full = niters * np.cov(psibar, rowvar=False, ddof=1).reshape(nparams, nparams)

    w = np.diag(w_full)
    b = np.diag(b_full)
    s2 = np.stack([np.diag(m) for m in s2_list], axis=0)  # (C, P)
    psibar2 = psibar.mean(axis=0)

    def covdiag(xx, yy):
        xc = xx - xx.mean(axis=0)
        yc = yy - yy.mean(axis=0)
        return (xc * yc).sum(axis=0) / (xx.shape[0] - 1)

    var_w = s2.var(axis=0, ddof=1) / nchains
    var_b = (2 / (nchains - 1)) * b**2
    var_wb = (niters / nchains) * (
        covdiag(s2, psibar**2) - 2 * psibar2 * covdiag(s2, psibar)
    )

    v = rfixed * w + rrandomscale * b
    var_v = rfixed**2 * var_w + rrandomscale**2 * var_b + 2 * rfixed * rrandomscale * var_wb
    df = 2 * v**2 / var_v
    b_df = nchains - 1
    w_df = 2 * w**2 / var_w

    estimates = np.empty(nparams)
    upper = np.empty(nparams)
    qq = 1 - alpha / 2
    for i in range(nparams):
        correction = (df[i] + 3) / (df[i] + 1)
        rrandom = rrandomscale * b[i] / w[i]
        estimates[i] = np.sqrt(correction * (rfixed + rrandom))
        if not np.isnan(rrandom):
            rrandom *= spstats.f.ppf(qq, b_df, w_df[i])
        upper[i] = np.sqrt(correction * (rfixed + rrandom))
    return estimates, upper, w_full, b_full


def gelman_multivariate(psi, alpha=0.05):
    import scipy.linalg as sla

    psi = np.asarray(psi, float)
    niters, nchains, nparams = psi.shape
    est, up, w_full, b_full = gelmandiag(psi, alpha)
    rfixed = (niters - 1) / niters
    rrandomscale = (nchains + 1) / (nchains * niters)
    l = np.linalg.cholesky(w_full)
    y = sla.solve_triangular(l, sla.solve_triangular(l, b_full, lower=True).T,
                             lower=True)
    lam = np.max(np.linalg.eigvalsh((y + y.T) / 2))
    return est, up, rfixed + rrandomscale * lam


# ---------------------------------------------------------------------------
# discrete diagnostics (oracle: literal per-element loops)
# ---------------------------------------------------------------------------


def weiss_sub_loop(u, v, t):
    m, d = u.shape
    nt = dt_ = 0.0
    m_tot = 0
    mp = np.zeros((m, d))
    ma = np.zeros(m)
    chi_stat = np.zeros(d)
    for j in range(m):
        p1 = p2 = 0.0
        for l in range(d):
            p1 += v[j, l] / (d * (t - 1))
            p2 += u[j, l] / (d * t)
            mp[j, l] = u[j, l] / t
            ma[j] += u[j, l] / (d * t)
        nt += p1
        dt_ += p2**2
        if ma[j] > 0:
            m_tot += 1
            for l in range(d):
                chi_stat[l] += (mp[j, l] - ma[j]) ** 2 / ma[j]
    phia = 1.0 + 1.0 / t - (1 - nt) / (1 - dt_)
    phia = min(max(phia, 0.0), 1.0 - np.finfo(float).eps)
    return phia, chi_stat, m_tot


def billingsley_sub_loop(f):
    m, _, d = f.shape
    mf = f.sum(axis=1)  # (m, d)
    a = (mf > 0).sum(axis=1)
    b = (f.sum(axis=2) > 0).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = f / mf[:, None, :]
        mp = f.sum(axis=2) / mf.sum(axis=1)[:, None]
    mp = np.nan_to_num(mp, nan=0.0)
    df = 0.0
    stat = 0.0
    idx = [j for j in range(m) if a[j] * b[j] > 0]
    for j in idx:
        df += (a[j] - 1) * (b[j] - 1)
        for k in idx:
            if mp[j, k] > 0:
                for l in range(d):
                    if mf[j, l] > 0 and np.isfinite(p[j, k, l]):
                        stat += mf[j, l] * (p[j, k, l] - mp[j, k]) ** 2 / mp[j, k]
    return stat, df, mp


def discrete_counts_loop(y, m):
    """u, v, f(to,from) built with the reference's per-draw scan."""
    n, d = y.shape
    u = np.zeros((m, d), dtype=int)
    v = np.zeros((m, d), dtype=int)
    f = np.zeros((m, m, d), dtype=int)
    for t in range(n):
        for c in range(d):
            u[y[t, c], c] += 1
            if t > 0:
                f[y[t, c], y[t - 1, c], c] += 1
                if y[t - 1, c] == y[t, c]:
                    v[y[t, c], c] += 1
    return u, v, f
