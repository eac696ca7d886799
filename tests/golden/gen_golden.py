"""Golden-vector generator: a LITERAL float64 transcription of the reference
Julia implementation (/root/reference/src/*.jl), kept deliberately separate
from tests/ref_impl.py (which is a loop-based NumPy re-derivation by the same
author). The two oracles were written from independent readings of the
reference months apart; their agreement plus the library's is what the stored
vectors certify.

Every function carries the reference file:line it transcribes. Run this file
to (re)generate ``golden.json``; tests load the stored vectors and never call
this module, so the goldens are pinned artifacts, not code that can drift with
the library.

Transcription notes (Julia -> NumPy):
- ``Statistics.var(corrected=true)``  -> ``np.var(ddof=1)``
- ``StatsBase.tiedrank``              -> ``scipy.stats.rankdata(method="average")``
- ``StatsFuns.norminvcdf``            -> ``scipy.special.ndtri``
- ``StatsFuns.betainvcdf``            -> ``scipy.special.betaincinv``
- ``Statistics.quantile``/``median``  -> NumPy defaults (both are Hyndman-Fan
  type 7 linear interpolation)
- ``vec(::Matrix)`` is column-major   -> ``reshape(-1, order="F")``
"""

from __future__ import annotations

import json
import os

import numpy as np
from scipy.special import betaincinv, ndtri
from scipy.stats import rankdata

# ---------------------------------------------------------------------------
# src/utils.jl
# ---------------------------------------------------------------------------


def copyto_split(x: np.ndarray, split: int) -> np.ndarray:
    """src/utils.jl:13-41: split each column of (m, n) into ``split`` columns
    of (m // split, n * split); if d = m % split > 0, one row is discarded
    after each of the first d splits of every column."""
    m, n = x.shape
    nrows_out = m // split
    d = m % split
    out = np.empty((nrows_out, n * split), dtype=np.float64)
    col = 0
    for j in range(n):
        offset = 0
        for k in range(1, split + 1):
            out[:, col] = x[offset : offset + nrows_out, j]
            offset += nrows_out + (1 if k <= d else 0)
            col += 1
    return out


def eachparam(x: np.ndarray):
    """src/utils.jl:205-207: iterate (draws, chains) slices over the flattened
    trailing parameter dims; 1-d input is a single one-chain slice."""
    if x.ndim == 1:
        yield x[:, None]
        return
    flat = x.reshape(x.shape[0], x.shape[1], -1)
    for p in range(flat.shape[2]):
        yield flat[:, :, p]


def nparams(x: np.ndarray) -> int:
    return 1 if x.ndim <= 2 else int(np.prod(x.shape[2:]))


def fold_around_median(x: np.ndarray) -> np.ndarray:
    """src/utils.jl:148-158."""
    y = np.empty(np.asarray(x, dtype=np.float64).shape)
    for xi, yi in zip(eachparam(np.asarray(x, np.float64)), eachparam(y)):
        yi[...] = np.abs(xi - np.median(xi.reshape(-1, order="F")))
    return y


def rank_normalize(x: np.ndarray) -> np.ndarray:
    """src/utils.jl:169-193: tiedrank -> Blom alpha=3/8 -> norminvcdf."""
    y = np.empty(np.asarray(x, dtype=np.float64).shape)
    alpha = 3.0 / 8.0
    for xi, yi in zip(eachparam(np.asarray(x, np.float64)), eachparam(y)):
        flat = xi.reshape(-1, order="F")
        r = rankdata(flat, method="average")
        q = (r - alpha) / (len(r) - 2 * alpha + 1)  # utils.jl:189-193
        yi[...] = ndtri(q).reshape(xi.shape, order="F")
    return y


# ---------------------------------------------------------------------------
# src/ess_rhat.jl: autocovariance caches (l.76-213)
# ---------------------------------------------------------------------------


def nextprod23(n: int) -> int:
    """nextprod([2, 3], n) (src/ess_rhat.jl:110)."""
    best = None
    p3 = 1
    while p3 < 3 * max(n, 1):
        q = max(1, -(-n // p3))
        p2 = 1 << max(0, (q - 1).bit_length())
        cand = p3 * p2
        if cand >= n and (best is None or cand < best):
            best = cand
        p3 *= 3
    return best


class AutocovCacheDirect:
    """AutocovMethod cache (src/ess_rhat.jl:76-79,95-100,161-179)."""

    def __init__(self, samples, chain_var):
        self.samples = samples
        self.chain_var = chain_var

    def update(self):
        pass

    def mean_autocov(self, k: int) -> float:
        samples = self.samples
        niter = samples.shape[0]
        # dot(view(samples,1:niter-k,i), view(samples,k+1:niter,i)) / niter
        s = np.mean(
            [
                np.dot(samples[: niter - k, i], samples[k:, i])
                for i in range(samples.shape[1])
            ]
        )
        return s / niter


class AutocovCacheFFT:
    """FFTAutocovMethod cache (src/ess_rhat.jl:81-87,103-118,130-152,181-195):
    complex in-place c2c FFT of the zero-padded centered samples, |.|^2,
    inverse FFT; mean_autocov(k) = mean_i(Re c[k+1,i]/Re c[1,i] * var_i)
    * (niter-1)/niter."""

    def __init__(self, samples, chain_var):
        self.samples = samples
        self.chain_var = chain_var
        self.n = nextprod23(2 * samples.shape[0] - 1)
        self.cache = None

    def update(self):
        niter = self.samples.shape[0]
        buf = np.zeros((self.n, self.samples.shape[1]), dtype=np.complex128)
        buf[:niter] = self.samples
        f = np.fft.fft(buf, axis=0)
        self.cache = np.fft.ifft(np.abs(f) ** 2, axis=0)

    def mean_autocov(self, k: int) -> float:
        niter = self.samples.shape[0]
        c = self.cache
        vals = np.real(c[k]) / np.real(c[0]) * self.chain_var
        return np.mean(vals) * (niter - 1) / niter


class AutocovCacheBDA:
    """BDAAutocovMethod cache (src/ess_rhat.jl:89-93,120-126,154-159,197-213)."""

    def __init__(self, samples, chain_var):
        self.samples = samples
        self.chain_var = chain_var
        self.mean_chain_var = None

    def update(self):
        self.mean_chain_var = np.mean(self.chain_var)

    def mean_autocov(self, k: int) -> float:
        samples = self.samples
        niter = samples.shape[0]
        n = niter - k
        s = np.mean(
            [
                np.sum((samples[:n, j] - samples[k : k + n, j]) ** 2)
                for j in range(samples.shape[1])
            ]
        )
        return self.mean_chain_var - s / (2 * n)


_CACHES = {"direct": AutocovCacheDirect, "fft": AutocovCacheFFT, "bda": AutocovCacheBDA}


# ---------------------------------------------------------------------------
# src/ess_rhat.jl: _ess_rhat_basic! (l.488-602) and _rhat_basic! (l.350-409)
# ---------------------------------------------------------------------------


def ess_rhat_basic(
    chains: np.ndarray,
    *,
    relative: bool = False,
    autocov_method: str = "direct",  # reference default, src/ess_rhat.jl:493
    split_chains: int = 2,
    maxlag: int = 250,
):
    """Literal transcription of _ess_rhat_basic! (src/ess_rhat.jl:488-602)
    including the maxlag clamp of the caller (l.482)."""
    x = np.asarray(chains, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    niter = x.shape[0] // split_chains
    nchains = split_chains * x.shape[1]
    ntotal = niter * nchains
    maxlag = min(maxlag, niter - 4)  # l.482
    correctionfactor = (niter - 1) / niter
    rel_ess_max = np.log10(ntotal)

    P = nparams(x)
    ess = np.full(P, np.nan)
    rhat = np.full(P, np.nan)
    for i, chains_slice in enumerate(eachparam(x)):
        samples = copyto_split(chains_slice, split_chains)  # l.526
        chain_mean = samples.mean(axis=0)  # l.529
        chain_var = samples.var(axis=0, ddof=1)  # l.532-537
        W = chain_var.mean()  # l.538
        var_plus = correctionfactor * W + (
            np.var(chain_mean, ddof=1) if nchains > 1 else np.var(chain_mean, ddof=0)
        )  # l.542 corrected=(nchains>1)
        inv_var_plus = 1.0 / var_plus
        rhat[i] = np.sqrt(var_plus / W)  # l.545
        samples = samples - chain_mean  # l.548
        cache = _CACHES[autocov_method](samples, chain_var)
        cache.update()  # l.551

        rho_odd = 1 - inv_var_plus * (W - cache.mean_autocov(1))  # l.555
        rho_even = 1.0  # l.556
        p_t = rho_even + rho_odd  # l.559
        sum_p = p_t  # l.560
        k = 2  # l.562
        while k < (maxlag - 1):  # l.563
            rho_even = 1 - inv_var_plus * (W - cache.mean_autocov(k))
            rho_odd = 1 - inv_var_plus * (W - cache.mean_autocov(k + 1))
            delta = rho_even + rho_odd
            if not delta > 0:  # l.571
                break
            p_t = min(delta, p_t)  # l.574
            sum_p += p_t
            k += 2
        # l.590-591: antithetic tail term
        rho_even = (
            1 - inv_var_plus * (W - cache.mean_autocov(k)) if maxlag > 1 else 0.0
        )
        if np.isnan(sum_p) or np.isnan(rho_even):
            # Julia's max/min propagate NaN (Python's builtins don't):
            # tau = max(0, NaN) = NaN, ess = min(inv(NaN), cap) = NaN
            ess[i] = np.nan
            continue
        tau = max(0.0, 2 * sum_p + max(0.0, rho_even) - 1)  # l.591
        with np.errstate(divide="ignore"):
            ess[i] = min(1.0 / tau, rel_ess_max) if tau > 0 else rel_ess_max  # l.594
    if not relative:
        ess = ess * ntotal  # l.598-600
    return ess, rhat


def rhat_basic(chains: np.ndarray, *, split_chains: int = 2):
    """_rhat_basic! (src/ess_rhat.jl:362-409)."""
    x = np.asarray(chains, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    niter = x.shape[0] // split_chains
    nchains = split_chains * x.shape[1]
    correctionfactor = (niter - 1) / niter
    P = nparams(x)
    rhat = np.full(P, np.nan)
    for i, chains_slice in enumerate(eachparam(x)):
        samples = copyto_split(chains_slice, split_chains)
        chain_mean = samples.mean(axis=0)
        chain_var = samples.var(axis=0, ddof=1)
        W = chain_var.mean()
        var_plus = correctionfactor * W + (
            np.var(chain_mean, ddof=1) if nchains > 1 else np.var(chain_mean, ddof=0)
        )
        rhat[i] = np.sqrt(var_plus / W)
    return rhat


# ---------------------------------------------------------------------------
# kinds and estimator proxies (src/ess_rhat.jl:276-349,438-455,604-659)
# ---------------------------------------------------------------------------


def _expectand_proxy(kind, x, q=None):
    """src/ess_rhat.jl:626-659."""
    x = np.asarray(x, np.float64)
    if kind == "mean":
        return x
    if kind == "median":
        y = np.empty(x.shape)
        for xi, yi in zip(eachparam(x), eachparam(y)):
            yi[...] = xi <= np.median(xi.reshape(-1, order="F"))
        return y
    if kind == "std":
        y = np.empty(x.shape)
        for xi, yi in zip(eachparam(x), eachparam(y)):
            yi[...] = (xi - xi.mean()) ** 2
        return y
    if kind == "mad":
        return _expectand_proxy("median", fold_around_median(x))
    if kind == "quantile":
        y = np.empty(x.shape)
        for xi, yi in zip(eachparam(x), eachparam(y)):
            yi[...] = xi <= np.quantile(xi.reshape(-1, order="F"), q)
        return y
    raise ValueError(kind)


def ess(x, kind="bulk", *, tail_prob=0.1, q=None, **kw):
    """src/ess_rhat.jl:276-311."""
    if kind == "bulk":
        return ess_rhat_basic(rank_normalize(x), **kw)[0]  # l.604-606
    if kind == "basic":
        return ess_rhat_basic(x, **kw)[0]
    if kind == "tail":  # l.301-311
        lo = ess(x, "quantile", q=tail_prob / 2, **kw)
        hi = ess(x, "quantile", q=1 - tail_prob / 2, **kw)
        return np.minimum(lo, hi)
    return ess_rhat_basic(_expectand_proxy(kind, x, q), **kw)[0]


def rhat(x, kind="rank", *, split_chains=2):
    """src/ess_rhat.jl:335-349,410-420."""
    if kind == "basic":
        return rhat_basic(x, split_chains=split_chains)
    if kind == "bulk":
        return rhat_basic(rank_normalize(x), split_chains=split_chains)
    if kind == "tail":
        return rhat_basic(
            rank_normalize(fold_around_median(x)), split_chains=split_chains
        )
    if kind == "rank":
        return np.maximum(
            rhat(x, "bulk", split_chains=split_chains),
            rhat(x, "tail", split_chains=split_chains),
        )
    raise ValueError(kind)


def ess_rhat(x, kind="rank", **kw):
    """src/ess_rhat.jl:438-455,604-624."""
    split_chains = kw.get("split_chains", 2)
    if kind == "basic":
        return ess_rhat_basic(x, **kw)
    if kind == "bulk":
        return ess_rhat_basic(rank_normalize(x), **kw)
    if kind == "tail":  # l.607-616: ess=tail-ESS, rhat=tail-R-hat
        return ess(x, "tail", **kw), rhat(x, "tail", split_chains=split_chains)
    if kind == "rank":  # l.617-624
        e, rb = ess_rhat(x, "bulk", **kw)
        rt = rhat(x, "tail", split_chains=split_chains)
        return e, np.maximum(rt, rb)
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# src/mcse.jl
# ---------------------------------------------------------------------------

NORMCDF1 = 0.8413447460685429  # src/mcse.jl:1
NORMCDFN1 = 0.15865525393145705  # src/mcse.jl:2


def _mcse_quantile(xvec, p, seff):
    """src/mcse.jl:96-118."""
    if np.isnan(seff):
        return np.nan
    S = len(xvec)
    alpha = seff * p + 1
    beta = seff * (1 - p) + 1
    prob_x_upper = betaincinv(alpha, beta, NORMCDF1)
    prob_x_lower = betaincinv(alpha, beta, NORMCDFN1)
    l = max(int(np.floor(prob_x_lower * S)), 1)
    u = min(int(np.ceil(prob_x_upper * S)), S)
    xs = np.sort(xvec)
    return (xs[u - 1] - xs[l - 1]) / 2


def mcse(x, kind="mean", *, p=None, **kw):
    """src/mcse.jl:40-95."""
    x = np.asarray(x, np.float64)
    if kind == "mean":
        S = ess(x, "mean", **kw)
        out = np.array(
            [xi.reshape(-1, order="F").std(ddof=1) for xi in eachparam(x)]
        ) / np.sqrt(S)
        return out
    if kind == "std":
        vals = np.empty(nparams(x))
        xs2 = _expectand_proxy("std", x)
        S = ess(xs2, "mean", **kw)
        for i, x2i in enumerate(eachparam(xs2)):
            mean_var = x2i.mean()
            mean_moment4 = (x2i**2).mean()
            vals[i] = np.sqrt((mean_moment4 / mean_var - mean_var) / S[i]) / 2
        return vals
    if kind == "median":
        S = ess(x, "median", **kw)
        return np.array(
            [
                _mcse_quantile(xi.reshape(-1, order="F"), 0.5, S[i])
                for i, xi in enumerate(eachparam(x))
            ]
        )
    if kind == "quantile":
        S = ess(x, "quantile", q=p, **kw)
        return np.array(
            [
                _mcse_quantile(xi.reshape(-1, order="F"), p, S[i])
                for i, xi in enumerate(eachparam(x))
            ]
        )
    raise ValueError(kind)


def mcse_sbm(x, f, batch_size=None):
    """src/mcse.jl:120-148."""
    x = np.asarray(x, np.float64)
    b = int(np.floor(np.sqrt(x.shape[0] * (x.shape[1] if x.ndim > 1 else 1)))) \
        if batch_size is None else batch_size

    def one(xvec):
        n = len(xvec)
        if np.all(xvec == xvec[0]):
            return np.nan
        vals = np.array([f(xvec[i : i + b]) for i in range(n - b + 1)])
        return np.sqrt(np.var(vals, ddof=0) * (b / n))

    return np.array([one(xi.reshape(-1, order="F")) for xi in eachparam(x)])


# ---------------------------------------------------------------------------
# src/rhat_nested.jl
# ---------------------------------------------------------------------------


def rhat_nested_basic(chains, chain_inds_cols, *, split_chains=2):
    """_rhat_nested_basic! (src/rhat_nested.jl:127-185). ``chain_inds_cols``
    is a list of column-index arrays, one per superchain."""
    x = np.asarray(chains, np.float64)
    nsuperchains = len(chain_inds_cols)
    P = nparams(x)
    rhat = np.full(P, np.nan)
    for i, chains_slice in enumerate(eachparam(x)):
        var_within_superchain = 0.0
        superchain_mean = np.empty(nsuperchains)
        for k, inds in enumerate(chain_inds_cols):
            samples = copyto_split(chains_slice[:, inds], split_chains)
            m = samples.shape[1]  # nchains_per_superchain
            chain_mean = samples.mean(axis=0)
            superchain_mean[k] = chain_mean.mean()
            chain_var = samples.var(axis=0, ddof=1)
            Wk = chain_var.mean()
            Bk = np.var(chain_mean, ddof=1) if m > 1 else np.var(chain_mean, ddof=0)
            var_within_superchain += Wk + Bk
        var_within_superchain /= nsuperchains
        var_between_superchains = np.var(superchain_mean, ddof=1)
        rhat[i] = np.sqrt(1 + var_between_superchains / var_within_superchain)
    return rhat


def rhat_nested(chains, superchain_ids, kind="rank", *, split_chains=2):
    """src/rhat_nested.jl:43-125."""
    ids = np.asarray(superchain_ids)
    cols = [np.flatnonzero(ids == u) for u in np.unique(ids)]
    if kind == "basic":
        return rhat_nested_basic(chains, cols, split_chains=split_chains)
    if kind == "bulk":
        return rhat_nested_basic(rank_normalize(chains), cols,
                                 split_chains=split_chains)
    if kind == "tail":
        return rhat_nested_basic(
            rank_normalize(fold_around_median(chains)), cols,
            split_chains=split_chains,
        )
    if kind == "rank":
        return np.maximum(
            rhat_nested(chains, superchain_ids, "bulk", split_chains=split_chains),
            rhat_nested(chains, superchain_ids, "tail", split_chains=split_chains),
        )
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# fixtures + generation
# ---------------------------------------------------------------------------


def ar1(rng, phi, sigma, size):
    """test/helpers.jl:4-12."""
    noise = rng.standard_normal(size)
    out = np.empty(size)
    out[0] = noise[0]
    for t in range(1, size[0]):
        out[t] = phi * out[t - 1] + sigma * noise[t]
    return out


def generate():
    cases = {}

    # --- case A: iid normal 1000 x 4 x 8 (test/ess_rhat.jl:210-240 shape) ---
    rng = np.random.default_rng(1234)
    xa = rng.standard_normal((1000, 4, 8))
    cases["iid_1000x4x8"] = {"x": xa.tolist()}
    c = cases["iid_1000x4x8"]
    for method in ("fft", "direct", "bda"):
        e, r = ess_rhat_basic(xa, autocov_method=method)
        c[f"ess_basic_{method}"] = e.tolist()
        c[f"rhat_basic_{method}"] = r.tolist()
    for kind in ("rank", "bulk", "tail", "basic"):
        e, r = ess_rhat(xa, kind)
        c[f"ess_rhat_{kind}_ess"] = e.tolist()
        c[f"ess_rhat_{kind}_rhat"] = r.tolist()
        c[f"rhat_{kind}"] = rhat(xa, kind).tolist()
    for kind in ("mean", "median", "std", "mad"):
        c[f"ess_{kind}"] = ess(xa, kind).tolist()
    c["ess_quantile_0.25"] = ess(xa, "quantile", q=0.25).tolist()
    c["ess_tail_relative"] = ess(xa, "tail", relative=True).tolist()
    c["mcse_mean"] = mcse(xa, "mean").tolist()
    c["mcse_std"] = mcse(xa, "std").tolist()
    c["mcse_median"] = mcse(xa, "median").tolist()
    c["mcse_quantile_0.25"] = mcse(xa, "quantile", p=0.25).tolist()
    c["mcse_sbm_mean"] = mcse_sbm(xa, np.mean).tolist()

    # --- case B: AR(1) phi=0.7, odd draws (split remainder rule), 3 chains ---
    rng = np.random.default_rng(5678)
    xb = ar1(rng, 0.7, 1.0, (1001, 3, 5))
    cases["ar1_1001x3x5"] = {"x": xb.tolist()}
    c = cases["ar1_1001x3x5"]
    for kind in ("rank", "bulk", "tail", "basic"):
        e, r = ess_rhat(xb, kind)
        c[f"ess_rhat_{kind}_ess"] = e.tolist()
        c[f"ess_rhat_{kind}_rhat"] = r.tolist()
    c["ess_basic_direct"] = ess_rhat_basic(xb, autocov_method="direct")[0].tolist()
    c["ess_basic_split3"] = ess_rhat_basic(xb, split_chains=3)[0].tolist()
    c["rhat_rank_split3"] = rhat(xb, "rank", split_chains=3).tolist()
    c["mcse_mean"] = mcse(xb, "mean").tolist()
    c["mcse_quantile_0.1"] = mcse(xb, "quantile", p=0.1).tolist()

    # --- case C: mixed-scale chains (tail-sensitive; test/ess_rhat.jl:337) ---
    rng = np.random.default_rng(91011)
    xc = rng.standard_normal((600, 4, 3))
    xc[:, :2, :] *= 4.0  # scale mismatch across chains
    cases["scalemix_600x4x3"] = {"x": xc.tolist()}
    c = cases["scalemix_600x4x3"]
    for kind in ("rank", "bulk", "tail"):
        e, r = ess_rhat(xc, kind)
        c[f"ess_rhat_{kind}_ess"] = e.tolist()
        c[f"ess_rhat_{kind}_rhat"] = r.tolist()

    # --- case D: nested R-hat, 8 chains in 4 superchains (rhat_nested.jl) ---
    rng = np.random.default_rng(1213)
    xd = ar1(rng, 0.3, 1.0, (500, 8, 6))
    xd[:, 4:, :] += 0.5  # shifted superchains -> Rn > 1
    ids = [0, 0, 1, 1, 2, 2, 3, 3]
    cases["nested_500x8x6"] = {"x": xd.tolist(), "ids": ids}
    c = cases["nested_500x8x6"]
    for kind in ("rank", "bulk", "tail", "basic"):
        c[f"rhat_nested_{kind}"] = rhat_nested(xd, ids, kind).tolist()
    c["rhat_nested_basic_split1"] = rhat_nested(
        xd, ids, "basic", split_chains=1
    ).tolist()

    # --- case E: short odd 2-d (scalar output path), 11 x 2 ---
    rng = np.random.default_rng(1415)
    xe = rng.standard_normal((11, 2))
    cases["small_11x2"] = {"x": xe.tolist()}
    c = cases["small_11x2"]
    e, r = ess_rhat(xe, "rank")
    c["ess_rhat_rank_ess"] = e.tolist()
    c["ess_rhat_rank_rhat"] = r.tolist()
    e, r = ess_rhat_basic(xe, autocov_method="direct")
    c["ess_basic_direct"] = e.tolist()
    c["rhat_basic"] = r.tolist()

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden.json")
    with open(out, "w") as fh:
        json.dump(cases, fh)
    print(f"wrote {out}: {[k for k in cases]}")


if __name__ == "__main__":
    generate()
