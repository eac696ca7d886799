"""Pallas TPU kernel: fused moments + centering + direct autocovariance.

The basic ESS/R-hat pipeline (reference ``_ess_rhat_basic!``,
src/ess_rhat.jl:488-602) needs, per split chain and parameter:

  chain mean -> centered samples -> unbiased chain variance
  -> autocovariance curve c_k = sum_i x_i x_{i+k} / n  (k = 0..maxlag)
  -> all-identical degeneracy flag (NaN poisoning, test/ess_rhat.jl:242-257)

Expressed as separate XLA ops this costs ~4-5 HBM passes over the split
samples (mean reduce, center+var, the degeneracy ``all(x == x[0,0])``
compare, and the autocov kernel's own read). This kernel does all of it in
ONE pass: each 128-series block is read into VMEM once, the mean/var/min/max
reductions and the centering happen on-chip, the centered block is staged
into a VMEM scratch padded with ``maxlag`` zero rows, and all lags accumulate
from on-chip memory exactly as in ``autocov_kernel.py``.

Numerically this is the reference's *default* estimator (``AutocovMethod``,
the biased ``dot(x[1:n-k], x[k+1:n]) / n`` of src/ess_rhat.jl:161-179) — not
the FFT approximation of it — so the TPU fast path is also the most faithful
one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _fused_kernel(
    x_ref, mean_ref, var_ref, mn_ref, mx_ref, acov_ref, scratch_ref,
    *, niter: int, maxlag: int,
):
    """x_ref: (niter, LANES) VMEM block of split samples (one series/lane).

    Outputs per lane: mean, unbiased variance, min, max (each (1, LANES)) and
    the direct autocovariance curve ((maxlag+1, LANES)). ``scratch_ref`` is a
    (niter+maxlag, LANES) VMEM buffer holding the centered series padded with
    zeros so every lag product is full-length (no variable-length slices).
    """
    x = x_ref[:]
    mean = jnp.sum(x, axis=0, keepdims=True) / niter  # (1, LANES)
    mean_ref[0, :] = mean[0]
    mn_ref[0, :] = jnp.min(x, axis=0)
    mx_ref[0, :] = jnp.max(x, axis=0)
    centered = x - mean
    var_ref[0, :] = jnp.sum(centered * centered, axis=0) / (niter - 1)
    scratch_ref[:niter, :] = centered
    scratch_ref[pl.ds(niter, maxlag), :] = jnp.zeros(
        (maxlag, _LANES), centered.dtype
    )

    def body(k, _):
        shifted = scratch_ref[pl.ds(k, niter), :]
        acov_ref[k, :] = jnp.sum(centered * shifted, axis=0) / niter
        return 0

    jax.lax.fori_loop(0, maxlag + 1, body, 0)


def pallas_moments_autocov(samples, maxlag: int, *, interpret: bool = False):
    """Fused per-series moments + direct autocov from ``(niter, C, P)``.

    Returns ``(chain_mean, chain_var, smin, smax, acov)`` with shapes
    ``(C, P)`` x4 and ``(maxlag+1, C, P)``; one HBM pass over the input.
    ``interpret=True`` runs in interpreter mode (CPU testing / f64 parity).
    """
    niter, nchains, nparams = samples.shape
    nseries = nchains * nparams
    x = samples.reshape(niter, nseries)
    lane_pad = (-nseries) % _LANES
    x = jnp.pad(x, ((0, 0), (0, lane_pad)))
    total = nseries + lane_pad
    nblocks = total // _LANES
    dt = samples.dtype

    row_spec = pl.BlockSpec((1, _LANES), lambda j: (0, j), memory_space=pltpu.VMEM)
    mean, var, mn, mx, acov = pl.pallas_call(
        functools.partial(_fused_kernel, niter=niter, maxlag=maxlag),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(
                (niter, _LANES), lambda j: (0, j), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            row_spec,
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec(
                (maxlag + 1, _LANES), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, total), dt),
            jax.ShapeDtypeStruct((1, total), dt),
            jax.ShapeDtypeStruct((1, total), dt),
            jax.ShapeDtypeStruct((1, total), dt),
            jax.ShapeDtypeStruct((maxlag + 1, total), dt),
        ],
        scratch_shapes=[pltpu.VMEM((niter + maxlag, _LANES), dt)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * niter * (maxlag + 5) * total,
            bytes_accessed=(niter + maxlag + 5) * total * jnp.dtype(dt).itemsize,
            transcendentals=0,
        ),
    )(x)

    def unpad(row):
        return row[0, :nseries].reshape(nchains, nparams)

    return (
        unpad(mean),
        unpad(var),
        unpad(mn),
        unpad(mx),
        acov[:, :nseries].reshape(maxlag + 1, nchains, nparams),
    )
