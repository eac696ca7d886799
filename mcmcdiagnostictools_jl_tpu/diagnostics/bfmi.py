"""Bayesian fraction of missing information (BFMI).

``bfmi = mean(diff(E)^2) / var(E)`` per chain (reference src/bfmi.jl:36-43).
Entirely local per chain — no cross-chain collectives needed; on a
chain-sharded mesh this runs embarrassingly parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.layout import _float_dtype


@jax.jit
def _bfmi_along_axis0(energy):
    d = jnp.diff(energy, axis=0)
    num = jnp.mean(d * d, axis=0)
    mean = jnp.mean(energy, axis=0, keepdims=True)
    c = energy - mean
    var = jnp.sum(c * c, axis=0) / (energy.shape[0] - 1)  # corrected (ddof=1)
    return num / var


def bfmi(energy, *, dims: int = 0):
    """BFMI of Hamiltonian ``energy`` draws.

    A vector input returns a scalar; a matrix returns one BFMI per chain, with
    ``dims`` the draw axis (default 0, i.e. shape ``(draws, chains)``).
    Reference: src/bfmi.jl:36-43 (Julia's ``dims`` is 1-based; ours is 0-based).
    """
    energy = jnp.asarray(energy)
    energy = energy.astype(_float_dtype(energy.dtype))
    if energy.ndim == 1:
        return _bfmi_along_axis0(energy[:, None])[0].item()
    if energy.ndim != 2:
        raise ValueError("energy must be a vector or a matrix of shape (draws, chains)")
    if dims not in (0, 1):
        raise ValueError("dims must be 0 or 1")
    if dims == 1:
        energy = energy.T
    return _bfmi_along_axis0(energy)
