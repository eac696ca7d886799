"""Pallas TPU kernels for the histogram/CDF fast rank mode.

The XLA radix-matmul formulation (ops/fastrank.py) is HBM-bound: the digit
one-hot operands are materialized per scan chunk (~40 GB of traffic at the
bench shape — measured ~50 ms per histogram pass and ~80 ms per table-lookup
pass on v5e). These kernels build the one-hots in VMEM and feed the MXU
directly, so each pass reads the sample once (~0.3 GB):

- ``pallas_hist_moments``: per-column bin counts + within-bin frac sums.
  For each sample row-block, the coarse/fine digit one-hots contract on the
  MXU (count pass in bf16 — exact 0/1 products, f32 accumulation; moment
  pass in f32) and accumulate into a VMEM-resident (P, kc, kf) output that
  is revisited across the row grid.
- ``pallas_rank_lookup``: per-element mean-anchored interpolated rank. The
  W=3 per-bin tables (prefix count, bin count, anchor offset) live in VMEM
  as a (P, W*kf, kc) block; the coarse one-hot contracts against them on the
  MXU and the fine one-hot selects the digit with a VPU reduction.

Layout: both kernels take the sample in its NATIVE (N, P) layout and
transpose each (I, Pb) block to (Pb, I) in VMEM scratch — parameters on
sublanes, elements on lanes — so the per-parameter loop is a cheap dynamic
sublane slice (dynamic LANE indexing would force relayouts). Kernel-side
block transposes replaced whole-array XLA transposes in round 4: the three
(N, P)<->(P, N) passes cost ~34 ms each at (1.28M, 256) while the per-block
VMEM relayout rides the existing pipeline.

Numerics are identical to the XLA path up to f32 accumulation order.
Reference semantics being approximated: src/utils.jl:169-193 (tiedrank +
Blom + norminvcdf); the approximation bound is documented in ops/fastrank.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# elements (lanes) per grid step
_ROW_BLOCK = 2048
# parameters per grid step: the native-layout (I, Pb) input block carries
# them on LANES, so Pb must be 128 (the lane tile width)
_PBLOCK = 128
# fine-digit widths. The MXU work of both kernels scales with nbins
# independent of the split; what the split controls is VPU work: the hist
# kernel builds kc+kf one-hot columns per element (balanced 64x64 minimizes
# the sum), while the lookup kernel additionally pays 3*kf multiply-add
# lanes per element for the fine selection — a NARROW fine digit wins there
# (kf=32: 96 VPU ops/elem vs 384 at kf=128; measured 233 -> ~112 ms at
# (1.28M, 256), nbins=4096)
_KF_HIST = 64
_KF_LOOKUP = 32


def _digit_split(nbins: int, kf_max: int):
    kf = min(kf_max, nbins)
    kc = nbins // kf
    assert kc * kf == nbins, (nbins, kf)
    return kc, kf


# AS241 PPND7 (Wichura 1988) rational coefficients — the single-precision
# inverse normal CDF (~1e-7 relative). Inlined because jax.scipy's ndtri
# lowers through erfinv with captured coefficient constants Mosaic rejects
# inside a pallas_call; spelled as Horner polynomials + sqrt/log it fuses
# straight into the lookup kernel (PERF.md round-4 lever: the XLA-side
# Blom+ndtri pass measured ~41 ms at the bench shape).
_PPND7_A = (3.3871327179e0, 5.0434271938e1, 1.5929113202e2, 5.9109374720e1)
_PPND7_B = (1.0, 1.7895169469e1, 7.8757757664e1, 6.7187563600e1)
_PPND7_C = (1.4234372777e0, 2.7568153900e0, 1.3067284816e0, 1.7023821103e-1)
_PPND7_D = (1.0, 7.3700164250e-1, 1.2021132975e-1)
_PPND7_E = (6.6579051150e0, 3.0812263860e0, 4.2868294337e-1, 1.7337203997e-2)
_PPND7_F = (1.0, 2.4197894225e-1, 1.2258202635e-2)


def _horner(r, coeffs):
    acc = jnp.full_like(r, coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * r + c
    return acc


def ppnd7(p):
    """Inverse standard normal CDF, AS241 single-precision branch.

    Pallas/Mosaic-safe: only mul/add/sqrt/log/select. Accuracy ~1.5e-7
    relative for p in (1e-38, 1 - 1e-7) — beyond f32's own resolution of
    the Blom quantiles this library feeds it. Matches
    jax.scipy.special.ndtri to ~4 f32 ULP (tested in interpret mode).
    """
    q = p - 0.5
    central = jnp.abs(q) <= 0.425
    # central branch: r in [0, 0.180625]
    r_c = 0.180625 - q * q
    x_c = q * _horner(r_c, _PPND7_A) / _horner(r_c, _PPND7_B)
    # tail branches: r = sqrt(-log(min(p, 1-p)))
    pt = jnp.where(central, 0.25, jnp.minimum(p, 1.0 - p))  # avoid log(0)
    r_t = jnp.sqrt(-jnp.log(jnp.maximum(pt, 1e-38)))
    near = r_t <= 5.0
    x_near = _horner(r_t - 1.6, _PPND7_C) / _horner(r_t - 1.6, _PPND7_D)
    x_far = _horner(r_t - 5.0, _PPND7_E) / _horner(r_t - 5.0, _PPND7_F)
    x_t = jnp.sign(q) * jnp.where(near, x_near, x_far)
    return jnp.where(central, x_c, x_t)


def _bins_row(x, lo, scale, nbins: int, valid):
    """Bin index (int32) and within-bin frac for a (1, I) row.

    Invalid (padding) lanes get bin id ``nbins`` — out of coarse range, so
    both digit one-hots are all-zero and they contribute nothing. (Computed
    per parameter row because Mosaic only supports dynamic slicing through
    refs, not on loaded arrays.)
    """
    s = (x - lo) * scale
    s = jnp.clip(s, 0.0, float(nbins))
    b = jnp.clip(s.astype(jnp.int32), 0, nbins - 1)
    frac = s - b.astype(s.dtype)
    b = jnp.where(valid, b, nbins)
    return b, frac


def _hist_kernel(x_ref, lo_ref, scale_ref, cnt_ref, s1_ref, xt_ref, *,
                 nbins: int, nvalid: int, pblock: int):
    """Grid: (pblocks, nchunks) — row chunks innermost, outputs revisited.

    ``x_ref``: (I, Pb) block of the native-layout sample; transposed once
    into the (Pb, I) ``xt_ref`` scratch so the per-parameter loop slices
    sublanes.
    """
    kc, kf = _digit_split(nbins, _KF_HIST)
    j = pl.program_id(1)
    nrows = x_ref.shape[0]

    @pl.when(j == 0)
    def _():
        cnt_ref[...] = jnp.zeros_like(cnt_ref)
        s1_ref[...] = jnp.zeros_like(s1_ref)

    xt_ref[...] = x_ref[...].T
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nrows), 1)
    valid = j * nrows + lane < nvalid
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (kc, nrows), 0)
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (kf, nrows), 0)

    def body(p, _):
        b, frac = _bins_row(
            xt_ref[pl.ds(p, 1), :], lo_ref[pl.ds(p, 1), :],
            scale_ref[pl.ds(p, 1), :], nbins, valid,
        )
        ac = iota_c == b // kf  # (kc, I)
        af = iota_f == b % kf  # (kf, I)
        cnt = jax.lax.dot_general(
            ac.astype(jnp.bfloat16),
            af.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s1 = jax.lax.dot_general(
            jnp.where(ac, frac, 0.0),
            af.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cnt_ref[pl.ds(p, 1)] += cnt[None]
        s1_ref[pl.ds(p, 1)] += s1[None]
        return 0

    jax.lax.fori_loop(0, pblock, body, 0, unroll=False)


def pallas_hist_moments(xf, lo, scale, nbins: int, *,
                        interpret: bool = False,
                        row_block: int = _ROW_BLOCK):
    """Per-column bin counts and frac sums from a native (N, P) sample.

    ``lo``/``scale``: (P,) range mapping (scale = nbins / (hi - lo), 0 for
    degenerate columns). Returns ``(cnt, s1)`` of shape (nbins, P), f32.
    """
    n, p = xf.shape
    kc, kf = _digit_split(nbins, _KF_HIST)
    ppad = (-p) % _PBLOCK
    npad = (-n) % row_block
    xf = jnp.pad(xf, ((0, npad), (0, ppad)))
    lo2 = jnp.pad(lo.astype(xf.dtype), (0, ppad)).reshape(-1, 1)
    sc2 = jnp.pad(scale.astype(xf.dtype), (0, ppad)).reshape(-1, 1)
    ptot = p + ppad
    pblocks = ptot // _PBLOCK
    nchunks = (n + npad) // row_block

    cnt, s1 = pl.pallas_call(
        functools.partial(_hist_kernel, nbins=nbins, nvalid=n,
                          pblock=_PBLOCK),
        grid=(pblocks, nchunks),
        in_specs=[
            pl.BlockSpec((row_block, _PBLOCK), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PBLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PBLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_PBLOCK, kc, kf), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PBLOCK, kc, kf), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ptot, kc, kf), jnp.float32),
            jax.ShapeDtypeStruct((ptot, kc, kf), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_PBLOCK, row_block), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * ptot * (n + npad) * nbins,
            bytes_accessed=ptot * (n + npad) * 4 + 2 * ptot * nbins * 4,
            transcendentals=0,
        ),
    )(xf, lo2, sc2)
    # (P, kc, kf) -> (nbins, P)
    cnt = cnt[:p].reshape(p, nbins).T
    s1 = s1[:p].reshape(p, nbins).T
    return cnt, s1


def _lookup_kernel(x_ref, lo_ref, scale_ref, tab_ref, out_ref, xt_ref,
                   rk_ref, *, nbins: int, pblock: int,
                   blom_scale: float | None = None):
    """tab_ref: (Pb, 3*kf, kc) — [c_lo; cnt; off] stacked along the fine
    axis; out_ref: (I, Pb) in native layout (computed per parameter row
    into the (Pb, I) ``rk_ref`` scratch, transposed back once at the end).

    ``blom_scale=None`` emits mean-anchored ranks; with ``blom_scale =
    1/(n + 1/4)`` the Blom quantile + inline AS241 ndtri fuse in and the
    kernel emits the rank-NORMAL transform z directly — the separate
    XLA-side Blom+ndtri pass (one more HBM read+write of the sample,
    ~41 ms at (1.28M, 256)) disappears.
    """
    kc, kf = _digit_split(nbins, _KF_LOOKUP)
    nrows = x_ref.shape[0]
    xt_ref[...] = x_ref[...].T
    valid = jnp.ones((1, nrows), dtype=bool)  # padding sliced off by caller
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (kc, nrows), 0)
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (kf, nrows), 0)

    def body(p, _):
        b, frac = _bins_row(
            xt_ref[pl.ds(p, 1), :], lo_ref[pl.ds(p, 1), :],
            scale_ref[pl.ds(p, 1), :], nbins, valid,
        )
        ac = (iota_c == b // kf).astype(jnp.float32)  # (kc, I)
        af = (iota_f == b % kf).astype(jnp.float32)  # (kf, I)
        rows = jax.lax.dot_general(
            tab_ref[pl.ds(p, 1)][0],  # (3*kf, kc)
            ac,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3*kf, I)
        c_lo = jnp.sum(rows[0 * kf:1 * kf, :] * af, axis=0, keepdims=True)
        cnt = jnp.sum(rows[1 * kf:2 * kf, :] * af, axis=0, keepdims=True)
        off = jnp.sum(rows[2 * kf:3 * kf, :] * af, axis=0, keepdims=True)
        g = jnp.clip(frac * cnt + off, 0.0, cnt)
        rank = c_lo + g + 0.5
        if blom_scale is not None:
            rank = ppnd7((rank - 0.375) * blom_scale)
        rk_ref[pl.ds(p, 1), :] = rank
        return 0

    jax.lax.fori_loop(0, pblock, body, 0, unroll=False)
    out_ref[...] = rk_ref[...].T


def pallas_rank_lookup(xf, lo, scale, tables, nbins: int, *,
                       interpret: bool = False,
                       row_block: int = _ROW_BLOCK,
                       blom_n: int | None = None):
    """Mean-anchored interpolated ranks of a native (N, P) sample.

    ``tables``: (3, nbins, P) — [prefix count C, bin count, anchor offset
    cnt*(1/2 - fm)]. Returns (N, P) ranks (before the degenerate override,
    which the caller applies with the Blom/ndtri step) — or, when
    ``blom_n`` (the GLOBAL element count) is given, the rank-normal z
    values directly via the fused Blom + inline-AS241 ndtri.
    """
    n, p = xf.shape
    kc, kf = _digit_split(nbins, _KF_LOOKUP)
    ppad = (-p) % _PBLOCK
    npad = (-n) % row_block
    xf = jnp.pad(xf, ((0, npad), (0, ppad)))
    lo2 = jnp.pad(lo.astype(xf.dtype), (0, ppad)).reshape(-1, 1)
    sc2 = jnp.pad(scale.astype(xf.dtype), (0, ppad)).reshape(-1, 1)
    ptot = p + ppad
    # (3, nbins, P) -> (P, 3, kf, kc) -> (P, 3*kf, kc)
    tab = jnp.pad(tables.astype(jnp.float32), ((0, 0), (0, 0), (0, ppad)))
    tab = tab.reshape(3, kc, kf, ptot).transpose(3, 0, 2, 1)
    tab = tab.reshape(ptot, 3 * kf, kc)
    pblocks = ptot // _PBLOCK
    nchunks = (n + npad) // row_block

    blom_scale = None if blom_n is None else 1.0 / (blom_n + 0.25)
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, nbins=nbins, pblock=_PBLOCK,
                          blom_scale=blom_scale),
        grid=(pblocks, nchunks),
        in_specs=[
            pl.BlockSpec((row_block, _PBLOCK), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PBLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PBLOCK, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PBLOCK, 3 * kf, kc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, _PBLOCK), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + npad, ptot), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_PBLOCK, row_block), jnp.float32),
            pltpu.VMEM((_PBLOCK, row_block), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * ptot * (n + npad) * 3 * nbins,
            bytes_accessed=ptot * (n + npad) * 8 + 3 * ptot * nbins * 4,
            transcendentals=0,
        ),
    )(xf, lo2, sc2, tab)
    return out[:n, :p]


def _minmax_kernel(x_ref, lo_ref, hi_ref, bad_ref, *, nvalid: int):
    """Revisited-output column min/max/NaN reduce; grid (pblocks, nchunks)."""
    j = pl.program_id(1)
    nrows = x_ref.shape[0]

    @pl.when(j == 0)
    def _():
        lo_ref[...] = jnp.full_like(lo_ref, jnp.inf)
        hi_ref[...] = jnp.full_like(hi_ref, -jnp.inf)
        bad_ref[...] = jnp.zeros_like(bad_ref)

    x = x_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = j * nrows + row < nvalid
    nan = jnp.isnan(x)
    lo_blk = jnp.min(jnp.where(valid & ~nan, x, jnp.inf), axis=0,
                     keepdims=True)
    hi_blk = jnp.max(jnp.where(valid & ~nan, x, -jnp.inf), axis=0,
                     keepdims=True)
    bad_blk = jnp.max((valid & nan).astype(jnp.float32), axis=0,
                      keepdims=True)
    lo_ref[...] = jnp.minimum(lo_ref[...], lo_blk)
    hi_ref[...] = jnp.maximum(hi_ref[...], hi_blk)
    bad_ref[...] = jnp.maximum(bad_ref[...], bad_blk)


def pallas_column_minmax(xf, *, interpret: bool = False,
                         row_block: int = _ROW_BLOCK):
    """Per-column (lo, hi, bad) of a native (N, P) sample in one HBM pass.

    The XLA triple reduce (min/max/any-NaN) measured 36 ms at (1.28M, 256)
    — ~10x the read roofline, presumably three un-fused passes; this kernel
    reads the sample once. Semantics match ops/fastrank.column_minmax: NaNs
    ignored for the range, all-NaN/empty columns fall back to [0, 1].
    """
    n, p = xf.shape
    ppad = (-p) % _PBLOCK
    npad = (-n) % row_block
    xf = jnp.pad(xf, ((0, npad), (0, ppad)))
    ptot = p + ppad
    lo, hi, bad = pl.pallas_call(
        functools.partial(_minmax_kernel, nvalid=n),
        grid=(ptot // _PBLOCK, (n + npad) // row_block),
        in_specs=[
            pl.BlockSpec((row_block, _PBLOCK), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _PBLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _PBLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _PBLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, ptot), xf.dtype),
            jax.ShapeDtypeStruct((1, ptot), xf.dtype),
            jax.ShapeDtypeStruct((1, ptot), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * ptot * (n + npad),
            bytes_accessed=ptot * (n + npad) * 4,
            transcendentals=0,
        ),
    )(xf)
    lo = lo[0, :p]
    hi = hi[0, :p]
    bad = bad[0, :p] > 0
    ok = jnp.isfinite(lo) & jnp.isfinite(hi)
    lo = jnp.where(ok, lo, 0.0)
    hi = jnp.where(ok, hi, 1.0)
    return lo, hi, bad
