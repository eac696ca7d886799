"""mcse parity + behavior tests (mirrors reference test/mcse.jl)."""

import numpy as np
import pytest

import ref_impl
import mcmcdiagnostictools_jl_tpu as mdt
from mcmcdiagnostictools_jl_tpu import Quantile

TOL = dict(rtol=1e-7, atol=1e-9)


class TestParity:
    @pytest.mark.parametrize("shape", [(1000, 4), (800, 4, 3)])
    def test_mean(self, rng, shape):
        x = ref_impl.ar1_matrix(rng, 0.4, 1.0, shape)
        got = np.asarray(mdt.mcse(x, kind="mean"))
        np.testing.assert_allclose(got, ref_impl.mcse_mean(x), **TOL)

    @pytest.mark.parametrize("shape", [(1000, 4), (800, 4, 3)])
    def test_std(self, rng, shape):
        x = ref_impl.ar1_matrix(rng, 0.4, 1.0, shape)
        got = np.asarray(mdt.mcse(x, kind="std"))
        np.testing.assert_allclose(got, ref_impl.mcse_std(x), **TOL)

    @pytest.mark.parametrize("p", [0.1, 0.25, 0.5, 0.75, 0.9])
    def test_quantile(self, rng, p):
        x = ref_impl.ar1_matrix(rng, 0.4, 1.0, (800, 4, 3))
        got = np.asarray(mdt.mcse(x, kind=Quantile(p)))
        want = ref_impl.mcse_quantile(x, p)
        np.testing.assert_allclose(got, want, **TOL)

    def test_median_equals_quantile_half(self, rng):
        x = ref_impl.ar1_matrix(rng, 0.4, 1.0, (800, 4, 3))
        got = np.asarray(mdt.mcse(x, kind="median"))
        want = np.asarray(mdt.mcse(x, kind=Quantile(0.5)))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    @pytest.mark.parametrize("kind", ["median", "q25", "q90", "mean", "std"])
    def test_fast_mode_tracks_exact(self, rng, kind):
        """rank_mode='fast' mcse is sort-free (histogram thresholds + order
        statistics) and tracks the exact path: mean/std are identical (no
        sort in either), median/quantile within the one-bin bound of the
        inverse-ECDF endpoints."""
        k = {"median": "median", "q25": Quantile(0.25), "q90": Quantile(0.9),
             "mean": "mean", "std": "std"}[kind]
        x = ref_impl.ar1_matrix(rng, 0.4, 1.0, (4000, 4, 3))
        a = np.asarray(mdt.mcse(x, kind=k))
        b = np.asarray(mdt.mcse(x, kind=k, rank_mode="fast"))
        tol = 0 if kind in ("mean", "std") else 5e-2
        np.testing.assert_allclose(b, a, rtol=max(tol, 1e-12))

    def test_fast_mode_nan_and_constant(self, rng):
        x = ref_impl.ar1_matrix(rng, 0.4, 1.0, (1000, 4, 3))
        x[5, 2, 1] = np.nan
        x[:, :, 2] = 3.0
        b = np.asarray(mdt.mcse(x, kind="median", rank_mode="fast"))
        assert np.isfinite(b[0]) and np.isnan(b[1]) and np.isnan(b[2])

    def test_sbm_fallback(self, rng):
        x = ref_impl.ar1_matrix(rng, 0.4, 1.0, (500, 4, 2))
        import jax.numpy as jnp

        f = lambda w: jnp.mean(w)
        got = np.asarray(mdt.mcse(x, kind=f))
        want = ref_impl.mcse_sbm(x, lambda w: np.mean(w))
        np.testing.assert_allclose(got, want, **TOL)

    def test_sbm_batch_size(self, rng):
        x = rng.standard_normal((300, 2))
        import jax.numpy as jnp

        got = mdt.mcse(x, kind=lambda w: jnp.mean(w), batch_size=10)
        want = ref_impl.mcse_sbm(x, lambda w: np.mean(w), batch_size=10)
        np.testing.assert_allclose(got, want, **TOL)


class TestBehavior:
    def test_scalar_for_2d(self, rng):
        x = rng.standard_normal((1000, 4))
        assert isinstance(mdt.mcse(x), float)
        assert isinstance(mdt.mcse(x, kind="std"), float)
        assert isinstance(mdt.mcse(x, kind=Quantile(0.3)), float)

    def test_shape_preserved(self, rng):
        x = rng.standard_normal((400, 4, 3, 2))
        for kind in ("mean", "std", "median"):
            assert np.asarray(mdt.mcse(x, kind=kind)).shape == (3, 2)

    def test_mcse_decreases_with_sample_size(self, rng):
        # mcse(mean) ~ sigma/sqrt(ess)
        small = rng.standard_normal((250, 4))
        big = rng.standard_normal((4000, 4))
        assert mdt.mcse(big) < mdt.mcse(small)

    def test_estimate_within_tolerance(self, rng):
        # the true mean (0) should be within ~4 mcse of the sample mean
        x = ref_impl.ar1_matrix(rng, 0.5, 1.0, (2000, 4))
        se = mdt.mcse(x)
        assert abs(x.mean()) < 5 * se

    def test_allsame_nan_sbm(self):
        import jax.numpy as jnp

        x = np.full((100, 2), 3.0)
        assert np.isnan(mdt.mcse(x, kind=lambda w: jnp.mean(w)))

    def test_nan_poisons(self, rng):
        x = rng.standard_normal((400, 4, 2))
        x[0, 0, 0] = np.nan
        out = np.asarray(mdt.mcse(x, kind=Quantile(0.25)))
        assert np.isnan(out[0]) and np.isfinite(out[1])

    def test_unknown_kind_raises(self, rng):
        with pytest.raises(ValueError):
            mdt.mcse(rng.standard_normal((100, 4)), kind="bogus")

    def test_sbm_rejects_ess_kwargs(self, rng):
        import jax.numpy as jnp

        with pytest.raises(TypeError):
            mdt.mcse(rng.standard_normal((100, 4)), kind=lambda w: jnp.mean(w),
                     split_chains=1)
