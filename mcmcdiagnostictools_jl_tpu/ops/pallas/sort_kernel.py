"""Pallas TPU kernel: VMEM-staged bitonic sort along axis 0 with payload.

XLA lowers ``lax.sort`` to a flat bitonic network: ~log^2(N)/2 compare-
exchange passes, each a full HBM round trip (measured HBM-bound: ~196 ms for
(1.28M, 64) f32+i32 unstable). This kernel runs the same network but stages
every stride < TILE inside VMEM:

- Phase A (1 HBM pass): each (TILE, 128) block is sorted in VMEM through all
  bitonic stages k <= TILE. For k < TILE the direction bit
  ``(row & k) == 0`` depends only on local row bits; for k == TILE it is the
  tile-index parity (passed via the grid).
- Phase B, for each outer stage m = 2, 4, ..., ntiles (in tile units):
  - ``log2(m)`` cross-tile passes (stride >= TILE): every output tile is the
    elementwise min- or max-half of (tile, tile XOR stride); the direction
    ``(tile & m) == 0`` and lo/hi role ``(tile & stride) == 0`` are tile
    constants.
  - ONE fused VMEM pass covering all strides TILE/2 .. 1 of stage m, with the
    direction bit ``(tile & m) != 0`` constant per tile.

HBM pass count: 1 + sum_j (j + 1) for j = 1..log2(ntiles) — e.g. 2^21 rows,
TILE 2^12: 55 passes vs ~230 (cross passes read 2x, so traffic is ~3x lower
overall). Rows pad to a power of two with +inf keys.

Used as the fast path for the rank transform's two payload sorts (ties are
averaged downstream, so the network's instability is harmless).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TILE = 2048


def _flag_mask(flag_i32, shape):
    """Vector bool mask from a traced scalar int flag.

    Mosaic cannot broadcast a scalar bool into a vector (i8 -> i1 trunc); a
    full() of the int flag followed by a vector compare lowers cleanly.
    """
    return jnp.full(shape, flag_i32, dtype=jnp.int32) == 1


def _cmpx_local(keys, payload, stride: int, stage: int, dir_bit,
                hw_roll: bool = True):
    """In-VMEM compare-exchange at ``stride`` < rows within ``stage``.

    Two lowerings, selected by stride:

    - ``stride >= 8`` — reshape form: view (T, L) as (T/2s, 2, s, L); the pair
      halves are adjacent on dim 1, so the exchange is a min/max over two
      (T/2s, s, L) vectors plus one interleaving store. Sublane-aligned for
      f32 when s is a multiple of 8 (Mosaic rejects s < 8: singleton-dim
      vector truncs), and moves ~3x less VMEM data than the rotate form.
    - ``stride < 8`` — rotate form: partner ``row XOR stride`` via two sublane
      rotates (register shuffles) and full-size selects.

    ``dir_bit``: traced scalar, the (row & stage) bit shared by the whole
    block when stage >= rows (0 => ascending); ignored for stage < rows where
    the bit comes from local row indices.
    """
    t = keys.shape[0]
    if stride >= 8 and t % (2 * stride) == 0:
        return _cmpx_reshape(keys, payload, stride, stage, dir_bit)
    return _cmpx_rotate(keys, payload, stride, stage, dir_bit, hw_roll)


def _cmpx_reshape(keys, payload, stride: int, stage: int, dir_bit):
    t, lanes = keys.shape
    g = t // (2 * stride)
    k4 = keys.reshape(g, 2, stride, lanes)
    p4 = payload.reshape(g, 2, stride, lanes)
    lo_k, hi_k = k4[:, 0], k4[:, 1]  # (g, stride, L)
    lo_p, hi_p = p4[:, 0], p4[:, 1]
    if stage >= t:
        desc = _flag_mask(dir_bit, (g, stride, lanes))
    else:
        # row = a*2s + b*s + c: the (row & stage) bit depends only on the
        # group index a (stage >= 2*stride always holds in the network)
        grp = jax.lax.broadcasted_iota(jnp.int32, (g, stride, lanes), 0)
        desc = (grp & (stage // (2 * stride))) != 0
    swap = (lo_k > hi_k) != desc
    new_lo_k = jnp.where(swap, hi_k, lo_k)
    new_hi_k = jnp.where(swap, lo_k, hi_k)
    new_lo_p = jnp.where(swap, hi_p, lo_p)
    new_hi_p = jnp.where(swap, lo_p, hi_p)
    keys = jnp.stack([new_lo_k, new_hi_k], axis=1).reshape(t, lanes)
    payload = jnp.stack([new_lo_p, new_hi_p], axis=1).reshape(t, lanes)
    return keys, payload


def _cmpx_rotate(keys, payload, stride: int, stage: int, dir_bit,
                 hw_roll: bool = True):
    t = keys.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, _LANES), 0)
    is_lo = (rows & stride) == 0
    # partner = row XOR stride, reached by circular shifts: out[i] = in[i+s]
    # is roll by t-s, out[i] = in[i-s] is roll by s. The TPU rotate
    # (pltpu.roll) is a register shuffle; jnp.roll (slices+concat) is kept
    # for interpreter mode.
    roll = pltpu.roll if hw_roll else jnp.roll
    fwd_k = roll(keys, t - stride, 0)
    bwd_k = roll(keys, stride, 0)
    fwd_p = roll(payload, t - stride, 0)
    bwd_p = roll(payload, stride, 0)
    partner_k = jnp.where(is_lo, fwd_k, bwd_k)
    partner_p = jnp.where(is_lo, fwd_p, bwd_p)
    lo_k = jnp.where(is_lo, keys, partner_k)
    hi_k = jnp.where(is_lo, partner_k, keys)
    lo_p = jnp.where(is_lo, payload, partner_p)
    hi_p = jnp.where(is_lo, partner_p, payload)
    if stage >= t:
        desc = _flag_mask(dir_bit, (t, _LANES))
    else:
        desc = (rows & stage) != 0
    # ties may swap under the descending XOR form — harmless: keys equal and
    # the payload permutation stays valid
    swap = (lo_k > hi_k) != desc
    new_lo_k = jnp.where(swap, hi_k, lo_k)
    new_hi_k = jnp.where(swap, lo_k, hi_k)
    new_lo_p = jnp.where(swap, hi_p, lo_p)
    new_hi_p = jnp.where(swap, lo_p, hi_p)
    keys = jnp.where(is_lo, new_lo_k, new_hi_k)
    payload = jnp.where(is_lo, new_lo_p, new_hi_p)
    return keys, payload


def _phase_a_kernel(k_ref, p_ref, ko_ref, po_ref, *, tile: int, max_stage: int,
                    hw_roll: bool = True):
    """Local bitonic sort: stages 2..max_stage (max_stage <= tile)."""
    tile_idx = pl.program_id(0)
    keys = k_ref[:]
    payload = p_ref[:]
    stage = 2
    while stage <= max_stage:
        dir_bit = (tile_idx & 1) if stage == tile else jnp.int32(0)
        stride = stage // 2
        while stride >= 1:
            keys, payload = _cmpx_local(keys, payload, stride, stage, dir_bit,
                                        hw_roll)
            stride //= 2
        stage *= 2
    ko_ref[:] = keys
    po_ref[:] = payload


def _cross_kernel(ka_ref, pa_ref, kb_ref, pb_ref, ko_ref, po_ref, *,
                  stride_tiles: int, stage_tiles: int):
    """Cross-tile pass: output tile = min/max half of (self, partner).

    a = this grid point's tile, b = its partner (tile XOR stride_tiles).
    lo role iff (tile & stride_tiles) == 0; ascending iff (tile & m) == 0.
    """
    t = pl.program_id(0)
    a_k, b_k = ka_ref[:], kb_ref[:]
    a_p, b_p = pa_ref[:], pb_ref[:]
    shape = a_k.shape
    is_lo = _flag_mask(jnp.int32((t & stride_tiles) == 0), shape)
    desc = _flag_mask(jnp.int32((t & stage_tiles) != 0), shape)
    # lo-of-pair / hi-of-pair values in canonical (lo, hi) orientation.
    # Both grid points of a pair compute the same swap mask from (lo, hi).
    lo_k = jnp.where(is_lo, a_k, b_k)
    hi_k = jnp.where(is_lo, b_k, a_k)
    lo_p = jnp.where(is_lo, a_p, b_p)
    hi_p = jnp.where(is_lo, b_p, a_p)
    swap = (lo_k > hi_k) != desc  # tie swaps harmless (equal keys)
    new_lo_k = jnp.where(swap, hi_k, lo_k)
    new_hi_k = jnp.where(swap, lo_k, hi_k)
    new_lo_p = jnp.where(swap, hi_p, lo_p)
    new_hi_p = jnp.where(swap, lo_p, hi_p)
    ko_ref[:] = jnp.where(is_lo, new_lo_k, new_hi_k)
    po_ref[:] = jnp.where(is_lo, new_lo_p, new_hi_p)


def _tail_kernel(k_ref, p_ref, ko_ref, po_ref, *, tile: int, stage_tiles: int,
                 hw_roll: bool = True):
    """Strides TILE..1 of outer stage m in ONE VMEM pass over a 2-tile block.

    The block covers tiles (2b, 2b+1), so the stride == TILE exchange (the
    old s=1 cross-tile pass) is local too — one pallas_call and one HBM round
    trip fewer per outer stage. Direction: rows r = b*2T + r_local and
    stage_rows = m*T with m >= 2, so (r & stage_rows) != 0 iff
    (b & (m//2)) != 0 — constant per block.
    """
    block_idx = pl.program_id(0)
    dir_bit = jnp.int32((block_idx & (stage_tiles // 2)) != 0)
    keys = k_ref[:]
    payload = p_ref[:]
    stage = stage_tiles * tile  # >= block rows: per-block constant direction
    stride = tile
    while stride >= 1:
        keys, payload = _cmpx_local(keys, payload, stride, stage, dir_bit,
                                    hw_roll)
        stride //= 2
    ko_ref[:] = keys
    po_ref[:] = payload


def _tile_spec(tile):
    return pl.BlockSpec((tile, _LANES), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)


def _partner_spec(tile, stride_tiles):
    return pl.BlockSpec((tile, _LANES), lambda i, j: (i ^ stride_tiles, j),
                        memory_space=pltpu.VMEM)


def staged_sort(keys, payload, *, tile: int = _TILE, interpret: bool = False):
    """Sort ``keys`` (N, P) ascending along axis 0, carrying ``payload``.

    Unstable (bitonic network). N pads to a power of two with +inf keys; P
    pads to a lane multiple. Returns (keys_sorted, payload_sorted) of the
    original shape.
    """
    n, p = keys.shape
    npow = 1 << max(1, (n - 1).bit_length())
    tile = min(tile, npow)
    lane_pad = (-p) % _LANES
    if jnp.issubdtype(keys.dtype, jnp.floating):
        pad_val = jnp.inf
    else:
        pad_val = jnp.iinfo(keys.dtype).max
    kx = jnp.pad(keys, ((0, npow - n), (0, lane_pad)), constant_values=pad_val)
    px = jnp.pad(payload, ((0, npow - n), (0, lane_pad)))
    ptot = p + lane_pad
    ntiles = npow // tile

    def call(kernel, operands, block_rows, nblocks, **kw):
        spec = pl.BlockSpec((block_rows, _LANES), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(nblocks, ptot // _LANES),
            in_specs=[s for s, _ in operands],
            out_specs=(spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct((npow, ptot), kx.dtype),
                jax.ShapeDtypeStruct((npow, ptot), px.dtype),
            ),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            **kw,
        )(*[a for _, a in operands])

    # Phase A: local sorts (stage k == tile uses tile parity when multi-tile)
    kx, px = call(
        functools.partial(_phase_a_kernel, tile=tile, max_stage=tile,
                          hw_roll=not interpret),
        [(_tile_spec(tile), kx), (_tile_spec(tile), px)],
        tile, ntiles,
    )

    # Phase B: per outer stage m, cross-tile passes at tile strides m/2..2,
    # then ONE fused 2-tile pass covering strides tile..1
    m = 2
    while m <= ntiles:
        s = m // 2
        while s >= 2:
            kx, px = call(
                functools.partial(_cross_kernel, stride_tiles=s, stage_tiles=m),
                [
                    (_tile_spec(tile), kx),
                    (_tile_spec(tile), px),
                    (_partner_spec(tile, s), kx),
                    (_partner_spec(tile, s), px),
                ],
                tile, ntiles,
            )
            s //= 2
        pair_spec = pl.BlockSpec((2 * tile, _LANES), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
        kx, px = call(
            functools.partial(_tail_kernel, tile=tile, stage_tiles=m,
                              hw_roll=not interpret),
            [(pair_spec, kx), (pair_spec, px)],
            2 * tile, ntiles // 2,
        )
        m *= 2

    return kx[:n, :p], px[:n, :p]
