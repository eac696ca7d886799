"""Pallas TPU kernel: batched direct autocovariance at small maxlag.

The FFT autocovariance pays for a length-``nextprod(2,3,2n-1)`` complex
round-trip through HBM (pad -> rfft -> |.|^2 -> irfft), of which only
``maxlag+1 << n`` lags are consumed. With ``maxlag = 250`` and ``n = 10^4``
the direct Geyer estimator ``c_k = sum_i x_i x_{i+k} / n`` needs the same
order of FLOPs but only ONE pass over the input: each 128-series block lives
in VMEM (~5 MB at n=10^4) and all lags accumulate from on-chip memory.

Layout: series along the 128-lane axis. The caller reshapes the canonical
``(niter, C, P)`` into ``(niter, C*P)`` (free), pads draws with ``maxlag``
zeros (making every lag's dot product full-length against zeros — no
variable-length slices) and pads series to a lane multiple.

This computes the exact ``AutocovMethod`` estimator (reference
src/ess_rhat.jl:161-179); it agrees with the FFT method to float tolerance.
``method="auto"`` on TPU selects the *fused* variant of this kernel
(fused_basic_kernel.py, which also folds in the chain moments); this unfused
kernel is the explicit ``method="pallas"`` path and the sharded default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _autocov_kernel(x_ref, out_ref, *, niter: int, maxlag: int):
    """x_ref: (niter+pad, LANES) VMEM; out_ref: (maxlag+1, LANES) VMEM."""
    x = x_ref[: niter, :]

    def body(k, _):
        shifted = x_ref[pl.ds(k, niter), :]
        out_ref[k, :] = jnp.sum(x * shifted, axis=0) / niter
        return 0

    jax.lax.fori_loop(0, maxlag + 1, body, 0)


def pallas_autocov(centered, maxlag: int, *, interpret: bool = False):
    """Direct autocovariance ``c_k = sum_i x_i x_{i+k} / n`` for k=0..maxlag.

    ``centered``: (niter, C, P) per-chain centered series. Returns
    (maxlag+1, C, P). ``interpret=True`` runs the kernel in interpreter mode
    (CPU testing).
    """
    niter, nchains, nparams = centered.shape
    nseries = nchains * nparams
    x = centered.reshape(niter, nseries)
    # pad draws so every lag-k product is full length against zeros, and pad
    # the series axis to a lane multiple
    lane_pad = (-nseries) % _LANES
    x = jnp.pad(x, ((0, maxlag), (0, lane_pad)))
    total = nseries + lane_pad
    nblocks = total // _LANES

    out = pl.pallas_call(
        functools.partial(_autocov_kernel, niter=niter, maxlag=maxlag),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(
                (niter + maxlag, _LANES),
                lambda j: (0, j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (maxlag + 1, _LANES), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((maxlag + 1, total), centered.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * niter * (maxlag + 1) * total,
            bytes_accessed=(niter + maxlag) * total * 4
            + (maxlag + 1) * total * 4,
            transcendentals=0,
        ),
    )(x)
    return out[:, :nseries].reshape(maxlag + 1, nchains, nparams)
