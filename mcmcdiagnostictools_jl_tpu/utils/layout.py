"""Canonical array layout helpers.

The canonical sample layout everywhere in this package is
``(draws, chains[, parameters...])`` — the first two axes are the sample axes
and any trailing axes are parameter axes (reference: src/utils.jl:197-211).

Internally every diagnostic works on the flattened 3-d form
``(draws, chains, P)`` with ``P = prod(param_shape)`` so that all kernels are
batched over a single parameter axis; the public API restores the original
parameter shape (and collapses to a scalar for <=2-d inputs, mirroring the
reference's ``_maybescalar``, src/utils.jl:214-215).
"""

from __future__ import annotations

import jax.numpy as jnp


def _float_dtype(dt):
    """Floating dtype of results for input dtype ``dt``.

    Mirrors the reference promotion ``typeof(zero(eltype(x)) / 1)``
    (src/ess_rhat.jl:353): floats stay as-is; integers/bools promote to the
    widest enabled float (float64 under ``jax_enable_x64`` — the parity mode —
    else float32).
    """
    if jnp.issubdtype(dt, jnp.floating):
        return dt
    # default float dtype: float64 under jax_enable_x64 (parity mode), else float32
    return jnp.result_type(float)


def canonicalize(x, min_ndim: int = 1):
    """Convert ``x`` of shape ``(draws[, chains[, params...]])`` to
    ``(draws, chains, P)`` plus the original parameter shape.

    Returns ``(x3, pshape)`` where ``x3`` has floating dtype and shape
    ``(draws, chains, P)``. A 1-d input gains a singleton chain axis, <=2-d
    inputs have ``pshape == ()`` (scalar outputs downstream).
    """
    x = jnp.asarray(x)
    if x.ndim < min_ndim:
        raise ValueError(
            f"samples must have at least {min_ndim} dimensions (draws, chains[, parameters...])"
        )
    if x.ndim == 0:
        raise ValueError("samples must have at least 1 dimension")
    if x.ndim == 1:
        x = x[:, None]
    pshape = x.shape[2:]
    x3 = x.reshape(x.shape[0], x.shape[1], -1)
    x3 = x3.astype(_float_dtype(x.dtype))
    return x3, pshape


def sample_dims(x) -> tuple:
    """Sample dimensions of ``x``: ``(0,)`` for 1-d, ``(0, 1)`` otherwise.

    Reference: ``_sample_dims``, src/utils.jl:197.
    """
    nd = jnp.asarray(x).ndim
    return tuple(range(min(2, nd)))


def param_shape(x) -> tuple:
    """Trailing parameter shape of ``x`` (dims 3+). Reference src/utils.jl:199."""
    return jnp.asarray(x).shape[2:]


def restore_param_shape(values, pshape: tuple):
    """Reshape a flat ``(P,)`` (or ``(..., P)``) result back to ``pshape``."""
    values = jnp.asarray(values)
    lead = values.shape[:-1]
    return values.reshape(lead + pshape)


def maybe_scalar(values, pshape: tuple):
    """Return a python scalar for empty ``pshape``, else an array shaped ``pshape``.

    Mirrors the reference's ``_maybescalar`` (src/utils.jl:214-215): inputs with
    no parameter dims produce scalar diagnostics.
    """
    values = restore_param_shape(values, pshape)
    if pshape == ():
        return values.reshape(()).item()
    return values
