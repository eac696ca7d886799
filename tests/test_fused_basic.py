"""Fused Pallas moments+autocov kernel: parity with the unfused pipeline.

The fused kernel (ops/pallas/fused_basic_kernel.py) must reproduce, in one
HBM pass, exactly what ``chain_stats`` + centering + the direct autocov
estimator produce: reference semantics src/ess_rhat.jl:161-179 (AutocovMethod,
the reference default) and the degenerate-slice NaN poisoning of
test/ess_rhat.jl:242-257. Runs in interpreter mode on CPU (f64).
"""

import numpy as np
import pytest

import jax

import mcmcdiagnostictools_jl_tpu as mdt

from mcmcdiagnostictools_jl_tpu.diagnostics.ess_rhat import _ess_rhat_pipeline
from mcmcdiagnostictools_jl_tpu.ops.moments import (
    chain_stats,
    fused_chain_stats_autocov,
)
from mcmcdiagnostictools_jl_tpu.ops.autocov import mean_autocov_curve


def _ar1(rng, phi, shape):
    x = rng.standard_normal(shape)
    for i in range(1, shape[0]):
        x[i] += phi * x[i - 1]
    return x


@pytest.mark.parametrize(
    "shape,maxlag",
    [
        ((500, 4, 7), 250),  # lane padding (28 series)
        ((317, 3, 5), 100),  # odd draws, odd series count
        ((1000, 2, 128), 250),  # exact lane multiple
        ((60, 4, 3), 19),  # tiny
    ],
)
def test_fused_matches_unfused(shape, maxlag):
    rng = np.random.default_rng(0)
    x = _ar1(rng, 0.6, shape)
    stats_ref = chain_stats(x)
    centered = x - stats_ref.chain_mean[None]
    curve_ref = mean_autocov_curve(centered, stats_ref.chain_var, maxlag, "direct")
    stats, curve = fused_chain_stats_autocov(x, maxlag, interpret=True)
    np.testing.assert_allclose(stats.chain_mean, stats_ref.chain_mean, rtol=1e-12)
    np.testing.assert_allclose(stats.chain_var, stats_ref.chain_var, rtol=1e-12)
    np.testing.assert_allclose(stats.w, stats_ref.w, rtol=1e-12)
    np.testing.assert_allclose(stats.var_plus, stats_ref.var_plus, rtol=1e-12)
    np.testing.assert_allclose(stats.rhat, stats_ref.rhat, rtol=1e-12)
    assert np.array_equal(np.asarray(stats.degenerate), np.asarray(stats_ref.degenerate))
    np.testing.assert_allclose(curve, curve_ref, rtol=1e-10, atol=1e-12)


def test_fused_pipeline_matches_direct_method():
    rng = np.random.default_rng(1)
    x = _ar1(rng, 0.4, (800, 4, 6))
    a = _ess_rhat_pipeline(
        x, kind="basic", split_chains=2, maxlag=250, method="direct",
        relative=False,
    )
    b = _ess_rhat_pipeline(
        x, kind="basic", split_chains=2, maxlag=250, method="fused_interpret",
        relative=False,
    )
    np.testing.assert_allclose(a[0], b[0], rtol=1e-10)
    np.testing.assert_allclose(a[1], b[1], rtol=1e-12)


def test_fused_degenerate_and_nan_poisoning():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((100, 4, 3))
    x[:, :, 0] = 2.5  # identical slice -> NaN ess & rhat
    x[3, 1, 1] = np.nan  # NaN poisons its slice
    ess, rhat = _ess_rhat_pipeline(
        x, kind="basic", split_chains=2, maxlag=46, method="fused_interpret",
        relative=False,
    )
    ess, rhat = np.asarray(ess), np.asarray(rhat)
    assert np.isnan(ess[0]) and np.isnan(rhat[0])
    assert np.isnan(ess[1]) and np.isnan(rhat[1])
    assert np.isfinite(ess[2]) and np.isfinite(rhat[2])


def test_fused_constant_per_chain_not_degenerate():
    # each chain constant but at DIFFERENT values: the slice is not identical,
    # so no NaN poisoning from the degeneracy flag (W=0 still NaNs rhat via
    # 0-variance division, matching chain_stats)
    x = np.tile(np.array([1.0, 2.0, 3.0, 4.0])[None, :, None], (64, 1, 2))
    a = chain_stats(x)
    b, _ = fused_chain_stats_autocov(x, 10, interpret=True)
    assert np.array_equal(np.asarray(a.degenerate), np.asarray(b.degenerate))
    assert not bool(np.asarray(b.degenerate).any())


def test_auto_method_resolves_by_backend():
    from mcmcdiagnostictools_jl_tpu.diagnostics.ess_rhat import _method_name

    name = _method_name("auto")
    expected = "fused" if jax.default_backend() == "tpu" else "fft"
    assert name == expected


class TestAdaptiveGeyerLag:
    """The adaptive two-stage lag path (ess_rhat._ADAPTIVE_L0) must be
    bit-equivalent to the full computation: the walk-stopped certificate is
    prefix-determined, so the done branch only fires when identical."""

    def test_iid_done_branch_matches_direct(self, rng):
        # iid: every series stops within a pair or two -> done branch
        x = rng.standard_normal((4000, 4, 6))
        fused = mdt.ess_rhat(x, kind="basic",
                             autocov_method=mdt.FusedAutocovMethod(interpret=True))
        direct = mdt.ess_rhat(x, kind="basic", autocov_method=mdt.AutocovMethod())
        np.testing.assert_allclose(np.asarray(fused.ess),
                                   np.asarray(direct.ess), rtol=1e-8)

    def test_sticky_full_branch_matches_direct(self, rng):
        # AR(1) phi=0.995: pairs stay positive far beyond L0 -> full branch
        from conftest import ar1

        x = ar1(rng, 0.995, 1.0, (4000, 4, 2))
        x[:, :, 1] = rng.standard_normal((4000, 4))  # mixed: one iid column
        fused = mdt.ess_rhat(x, kind="basic",
                             autocov_method=mdt.FusedAutocovMethod(interpret=True))
        direct = mdt.ess_rhat(x, kind="basic", autocov_method=mdt.AutocovMethod())
        np.testing.assert_allclose(np.asarray(fused.ess),
                                   np.asarray(direct.ess), rtol=1e-8)
        # the sticky column must NOT have been truncated at L0: its ESS under
        # a forced-small maxlag would be notably different
        small = mdt.ess_rhat(x, kind="basic", maxlag=64,
                             autocov_method=mdt.AutocovMethod())
        assert not np.allclose(np.asarray(fused.ess)[0],
                               np.asarray(small.ess)[0], rtol=1e-3)
