"""Vectorized Geyer initial-monotone-positive-sequence ESS reduction.

The reference walks lags sequentially per parameter, summing pairs
``rho(2t) + rho(2t+1)`` until the first nonpositive pair, with a running-min
monotonicity clamp and an antithetic tail bias term
(src/ess_rhat.jl:553-601). Data-dependent early exit does not fit XLA, so the
same recurrence is computed here as masked prefix work over the whole lag
axis — one cumprod (alive mask), one cummin (monotone clamp), one masked sum —
batched over every parameter at once:

- ``Delta_t = rho(2t) + rho(2t+1)``; the t=0 pair ``1 + rho(1)`` is always
  summed (even if negative), matching src/ess_rhat.jl:555-560.
- alive(t) = all Delta_s > 0 for 1 <= s <= t  (first nonpositive pair stops
  the sum, src/ess_rhat.jl:569-571).
- p_t = min(Delta_0, ..., Delta_t)  (monotone clamp, src/ess_rhat.jl:574).
- tau = max(0, 2*sum_p + max(0, rho(k_final)) - 1) with ``k_final`` the first
  even lag after the stop (antithetic tail term, src/ess_rhat.jl:590-591).
- ess_rel = min(1/tau, log10(ntotal))  (the antithetic cap,
  src/ess_rhat.jl:514,594).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def geyer_ess_from_rho_dynamic(rho, ntotal, eff_maxlag, relative: bool = False):
    """Dynamic-length variant of :func:`geyer_ess_from_rho`.

    ``rho`` has static shape (Lmax+1, P) but only lags ``0..eff_maxlag`` are
    semantically valid; ``ntotal`` and ``eff_maxlag`` may be traced scalars or
    per-column (P,) arrays. Reproduces exactly what the static reduction
    would return for ``maxlag = eff_maxlag`` — used by the masked window
    kernels (batched Geweke / Heidelberger) where every window has a
    different live length but one compiled graph must serve them all.
    """
    lmax = rho.shape[0] - 1
    nparams = rho.shape[1]
    if lmax < 1:
        raise ValueError("rho must cover at least lag 1")
    dtype = rho.dtype
    ntotal = jnp.asarray(ntotal, dtype)
    eff_maxlag = jnp.asarray(eff_maxlag, jnp.int32)

    delta0 = 1.0 + rho[1]  # pair (rho_0=1, rho_1); always summed
    num_pairs = max(0, (lmax - 2) // 2)  # static upper bound on pair count
    # without a break the loop exits at the smallest even >= max(2, maxlag-1)
    k_nobreak = 2 * ((jnp.maximum(2, eff_maxlag - 1) + 1) // 2)

    if num_pairs > 0:
        t = jnp.arange(1, num_pairs + 1)
        # (T, 1) for scalar eff_maxlag, (T, P) for per-column lengths
        in_range = t[:, None] <= jnp.atleast_1d((eff_maxlag - 2) // 2)[None]
        delta = rho[2 * t] + rho[2 * t + 1]  # (T, P)
        positive = delta > 0
        # out-of-range pairs must neither break nor contribute
        alive = (
            jnp.cumprod((positive | ~in_range).astype(jnp.int32), axis=0).astype(bool)
            & in_range
        )
        p = jax.lax.cummin(jnp.concatenate([delta0[None], delta], axis=0), axis=0)[1:]
        tail_sum = jnp.sum(jnp.where(alive, p, jnp.zeros((), dtype)), axis=0)
        # A NaN pair breaks exactly like a nonpositive one (reference:
        # `Δ > zero(Δ) || break`, NaN > 0 is false) and is never summed;
        # NaN reaches the result only through sum_p (the always-summed lag-1
        # pair) or rho[k_final] — both checked below.
        broke_mask = (~positive) & in_range
        broke = jnp.any(broke_mask, axis=0)
        t_break = 1 + jnp.argmax(broke_mask, axis=0)
        k_final = jnp.where(broke, 2 * t_break, k_nobreak).astype(jnp.int32)
    else:
        tail_sum = jnp.zeros((nparams,), dtype)
        k_final = jnp.full((nparams,), 2, dtype=jnp.int32)

    sum_p = delta0 + tail_sum
    rho_even = jnp.take_along_axis(
        rho, jnp.clip(k_final, 0, lmax)[None], axis=0
    )[0]
    rho_even = jnp.where(eff_maxlag > 1, rho_even, jnp.zeros((), dtype))

    tau = jnp.maximum(0.0, 2.0 * sum_p + jnp.maximum(0.0, rho_even) - 1.0)
    ess_rel = jnp.minimum(1.0 / tau, jnp.log10(ntotal))
    ess_rel = jnp.where(jnp.isnan(sum_p) | jnp.isnan(rho_even), jnp.nan, ess_rel)
    if relative:
        return ess_rel
    return ess_rel * ntotal


def geyer_ess_from_rho(rho, ntotal: int, relative: bool = False):
    """ESS from autocorrelation curve ``rho`` of shape (maxlag+1, P).

    ``rho[k] = 1 - (W - mean_autocov(k)) / var_plus`` must be supplied for
    lags 0..maxlag with maxlag >= 1. Returns (P,) — absolute ESS, or relative
    (ESS / ntotal) when ``relative``.
    """
    maxlag = rho.shape[0] - 1
    nparams = rho.shape[1]
    if maxlag < 1:
        raise ValueError("maxlag must be >= 1")
    dtype = rho.dtype

    delta0 = 1.0 + rho[1]  # pair (rho_0=1, rho_1); always summed
    # pair iterations t = 1..T with k = 2t while k < maxlag - 1
    num_pairs = max(0, (maxlag - 2) // 2)
    # lag at loop exit without a break: smallest even >= max(2, maxlag - 1)
    k_nobreak = 2 * ((max(2, maxlag - 1) + 1) // 2)

    if num_pairs > 0:
        t = np.arange(1, num_pairs + 1)
        delta = rho[2 * t] + rho[2 * t + 1]  # (T, P)
        positive = delta > 0
        alive = jnp.cumprod(positive.astype(jnp.int32), axis=0).astype(bool)
        # running min including the t=0 pair
        p = jax.lax.cummin(jnp.concatenate([delta0[None], delta], axis=0), axis=0)[1:]
        tail_sum = jnp.sum(jnp.where(alive, p, jnp.zeros((), dtype)), axis=0)
        # A NaN pair breaks the walk exactly like a nonpositive one
        # (reference src/ess_rhat.jl:569-571: `Δ > zero(Δ) || break`, and
        # NaN > 0 is false) and is never summed. NaN therefore reaches the
        # result only through sum_p (the always-summed lag-1 pair poisons it
        # for whole-NaN columns) or through rho[k_final] when the BREAKING
        # even lag itself is NaN — both checked below, matching the
        # reference, which also never reads post-break lags.
        broke = jnp.any(~positive, axis=0)
        t_break = 1 + jnp.argmax(~positive, axis=0)
        k_final = jnp.where(broke, 2 * t_break, k_nobreak)
    else:
        tail_sum = jnp.zeros((nparams,), dtype)
        k_final = jnp.full((nparams,), 2, dtype=jnp.int32)

    sum_p = delta0 + tail_sum

    if maxlag > 1:
        rho_even = jnp.take_along_axis(rho, k_final[None].astype(jnp.int32), axis=0)[0]
    else:
        rho_even = jnp.zeros((nparams,), dtype)  # src/ess_rhat.jl:590

    tau = jnp.maximum(
        0.0, 2.0 * sum_p + jnp.maximum(0.0, rho_even) - 1.0
    )
    rel_ess_max = jnp.asarray(np.log10(ntotal), dtype)
    ess_rel = jnp.minimum(1.0 / tau, rel_ess_max)
    # NaN anywhere propagates (identical-sample / poisoned slices)
    ess_rel = jnp.where(jnp.isnan(sum_p) | jnp.isnan(rho_even), jnp.nan, ess_rel)
    if relative:
        return ess_rel
    return ess_rel * ntotal
