"""Valley-merge kernel parity (interpreter mode) vs the lax.sort fold path.

The kernel sorts a per-column valley (circularly bitonic) sequence — the
shape of ``|xs - med|`` when ``xs`` is sorted — so every test builds its
input through the real pipeline: sort, fold around a per-column pivot, merge.
Parity bar: sorted keys bit-identical to ``lax.sort``; payloads equivalent
up to tie order (validated by comparing tie-averaged ranks downstream).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmcdiagnostictools_jl_tpu.ops.ranknorm import (
    _VALLEY_BLOCK as _S,
    valley_sort_2d,
)

pytestmark = pytest.mark.slow


def _fold_input(rng, n, p, ties=False, nan_cols=(), pivot_q=0.5):
    x = rng.standard_normal((n, p)).astype(np.float32)
    if ties:
        x = np.round(x * 4) / 4  # heavy ties
    for c in nan_cols:
        x[rng.integers(0, n), c] = np.nan
    xs = jnp.sort(jnp.asarray(x), axis=0)
    iota = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    order = jax.lax.sort((xs, iota), dimension=0, num_keys=1, is_stable=False)[1]
    med = jnp.quantile(jnp.asarray(x), pivot_q, axis=0).astype(jnp.float32)
    folded = jnp.abs(xs - med[None, :])
    return folded, order


def _reference_sort(folded, order):
    return jax.lax.sort((folded, order), dimension=0, num_keys=1,
                        is_stable=False)


@pytest.mark.parametrize("n", [2 * _S, 3 * _S - 517, 5 * _S + 1, 9 * _S + 123])
@pytest.mark.parametrize("p", [8, 64])
def test_matches_lax_sort_keys(n, p):
    rng = np.random.default_rng(n + p)
    folded, order = _fold_input(rng, n, p)
    ks, pos = valley_sort_2d(folded, order)
    ref_k, _ = _reference_sort(folded, order)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(ref_k))
    # payload columns must remain permutations of the original positions
    # (tie-order freedom makes elementwise payload checks moot; rank-level
    # equivalence is asserted in test_fold_rank_pipeline_parity)
    srt = np.sort(np.asarray(pos), axis=0)
    ref_srt = np.sort(np.asarray(order), axis=0)
    np.testing.assert_array_equal(srt, ref_srt)


def test_ties_and_nan_columns():
    rng = np.random.default_rng(0)
    n, p = 2 * _S + 37, 16
    folded, order = _fold_input(rng, n, p, ties=True, nan_cols=(3, 7))
    ks, pos = valley_sort_2d(folded, order)
    ref_k, _ = _reference_sort(folded, order)
    # NaN columns compare with equal_nan (all-NaN: median poisoning)
    np.testing.assert_array_equal(np.isnan(np.asarray(ks)),
                                  np.isnan(np.asarray(ref_k)))
    both = np.where(np.isnan(np.asarray(ks)), 0.0, np.asarray(ks))
    ref = np.where(np.isnan(np.asarray(ref_k)), 0.0, np.asarray(ref_k))
    np.testing.assert_array_equal(both, ref)
    # NaN-free payload columns are permutations of 0..n-1
    pos_np = np.sort(np.asarray(pos), axis=0)
    clean = ~np.isnan(np.asarray(folded)).any(axis=0)
    np.testing.assert_array_equal(
        pos_np[:, clean], np.arange(n)[:, None].repeat(clean.sum(), 1)
    )


def test_constant_column():
    n, p = 2 * _S, 4
    folded = jnp.zeros((n, p), jnp.float32)
    order = jax.lax.broadcasted_iota(jnp.int32, (n, p), 0)
    ks, pos = valley_sort_2d(folded, order)
    np.testing.assert_array_equal(np.asarray(ks), np.zeros((n, p), np.float32))
    srt = np.sort(np.asarray(pos), axis=0)
    np.testing.assert_array_equal(srt, np.arange(n)[:, None].repeat(p, 1))


def test_f64_parity():
    """The decomposition is dtype-agnostic: f64 keys bit-identical too."""
    rng = np.random.default_rng(3)
    n, p = 2 * _S + 77, 6
    folded, order = _fold_input(rng, n, p, ties=True)
    f64 = jnp.asarray(np.asarray(folded), jnp.float64)
    ks, _ = valley_sort_2d(f64, order)
    ref_k, _ = _reference_sort(f64, order)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(ref_k))


def test_fold_rank_pipeline_parity():
    """End-to-end: tie-averaged ranks off the merge == off lax.sort."""
    from mcmcdiagnostictools_jl_tpu.ops.ranknorm import _avg_ranks_sorted

    rng = np.random.default_rng(5)
    n, p = 2 * _S + 999, 12
    folded, order = _fold_input(rng, n, p, ties=True)
    ks, pos = valley_sort_2d(folded, order)
    ref_k, ref_pos = _reference_sort(folded, order)
    r_merge = np.asarray(_avg_ranks_sorted(ks))
    r_ref = np.asarray(_avg_ranks_sorted(ref_k))
    np.testing.assert_array_equal(r_merge, r_ref)
    # rank assigned to each original position must match: scatter ranks back
    inv_merge = np.empty((n, p))
    inv_ref = np.empty((n, p))
    cols = np.arange(p)[None, :].repeat(n, 0)
    inv_merge[np.asarray(pos), cols] = r_merge
    inv_ref[np.asarray(ref_pos), cols] = r_ref
    np.testing.assert_array_equal(inv_merge, inv_ref)


def test_ess_rhat_fold_impl_merge_matches_sort():
    """End-to-end rank/tail kinds: fold_impl='merge' == 'sort'."""
    import mcmcdiagnostictools_jl_tpu as mdt

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2 * _S + 100, 2, 3)).astype(np.float32)
    x[:, 1, 2] = np.nan  # poisoned slice
    for kind in ("rank", "tail"):
        a = mdt.ess_rhat(x, kind=kind, fold_impl="sort")
        b = mdt.ess_rhat(x, kind=kind, fold_impl="merge")
        np.testing.assert_allclose(np.asarray(a.ess), np.asarray(b.ess),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a.rhat), np.asarray(b.rhat),
                                   rtol=1e-6, equal_nan=True)
    r1 = mdt.rhat(x, kind="rank", fold_impl="sort")
    r2 = mdt.rhat(x, kind="rank", fold_impl="merge")
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6,
                               equal_nan=True)
