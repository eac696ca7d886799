"""Tests for the classical suite: Gelman PSRF, Geweke, Heidelberger-Welch,
Raftery-Lewis (reference test/gelmandiag.jl, test/gewekediag.jl,
test/heideldiag.jl, test/rafterydiag.jl)."""

import numpy as np
import pytest

import ref_impl
import mcmcdiagnostictools_jl_tpu as mdt


class TestGelman:
    def test_parity_with_oracle(self, rng):
        x = ref_impl.ar1_matrix(rng, 0.3, 1.0, (600, 4, 5))
        got = mdt.gelmandiag(x)
        want_psrf, want_ci, _, _ = ref_impl.gelmandiag(x)
        np.testing.assert_allclose(np.asarray(got.psrf), want_psrf, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(got.psrfci), want_ci, rtol=1e-7)

    def test_multivariate_parity(self, rng):
        x = ref_impl.ar1_matrix(rng, 0.3, 1.0, (600, 4, 5))
        got = mdt.gelmandiag_multivariate(x)
        _, _, want_mv = ref_impl.gelman_multivariate(x)
        np.testing.assert_allclose(got.psrfmultivariate, want_mv, rtol=1e-8)

    def test_converged_near_one(self, rng):
        x = rng.standard_normal((2000, 4, 8))
        r = mdt.gelmandiag(x)
        assert np.all(np.asarray(r.psrf) < 1.05)
        assert np.all(np.asarray(r.psrfci) >= np.asarray(r.psrf) - 1e-12)

    def test_nonconverged_flagged(self, rng):
        x = rng.standard_normal((500, 4, 2))
        x[:, 0, :] += 4.0
        assert np.all(np.asarray(mdt.gelmandiag(x).psrf) > 1.2)

    def test_errors(self, rng):
        with pytest.raises(ValueError):
            mdt.gelmandiag(rng.standard_normal((100, 1, 3)))  # <2 chains
        with pytest.raises(ValueError):
            mdt.gelmandiag_multivariate(rng.standard_normal((100, 4, 1)))  # <2 params
        with pytest.raises(ValueError):
            mdt.gelmandiag(rng.standard_normal((100, 4)))  # not 3-d


class TestGeweke:
    def test_converged_not_flagged(self, rng):
        x = rng.standard_normal(5000)
        r = mdt.gewekediag(x)
        assert abs(r.zscore) < 4
        assert 0 <= r.pvalue <= 1

    def test_drifting_flagged(self, rng):
        x = rng.standard_normal(5000) + np.linspace(0, 5, 5000)
        r = mdt.gewekediag(x)
        assert r.pvalue < 0.05

    def test_pvalue_formula(self, rng):
        import math

        x = rng.standard_normal(2000)
        r = mdt.gewekediag(x)
        np.testing.assert_allclose(r.pvalue, math.erfc(abs(r.zscore) / math.sqrt(2)))

    def test_errors(self, rng):
        x = rng.standard_normal(100)
        with pytest.raises(ValueError):
            mdt.gewekediag(x, first=0.0)
        with pytest.raises(ValueError):
            mdt.gewekediag(x, last=1.0)
        with pytest.raises(ValueError):
            mdt.gewekediag(x, first=0.6, last=0.5)


class TestHeidel:
    def test_stationary_series_passes(self, rng):
        x = rng.standard_normal(2000) + 10.0
        r = mdt.heideldiag(x)
        assert r.stationarity
        assert r.burnin == 0  # converged at the first candidate, start=1
        assert r.pvalue > 0.05
        assert r.test  # halfwidth passes for mean >> mcse
        np.testing.assert_allclose(r.mean, np.mean(x), rtol=1e-12)

    def test_nonstationary_burnin_detected(self, rng):
        # moderate decaying transient: the CvM statistic stays in the range
        # where the 4-term pcramer series (the reference's formula,
        # src/heideldiag.jl:56-68) is a valid CDF approximation
        n = 2000
        x = rng.standard_normal(n) + 10.0
        x[: n // 5] += np.linspace(2.0, 0, n // 5)
        r = mdt.heideldiag(x)
        assert r.burnin > 0
        assert r.stationarity  # converged after discarding the transient

    def test_small_mean_fails_halfwidth(self, rng):
        x = rng.standard_normal(500) * 10.0  # mean ~ 0, halfwidth ratio huge
        r = mdt.heideldiag(x)
        assert not r.test

    def test_start_offset(self, rng):
        x = rng.standard_normal(1000) + 5
        r1 = mdt.heideldiag(x, start=1)
        r2 = mdt.heideldiag(x, start=101)
        assert r2.burnin == r1.burnin + 100


class TestRaftery:
    def test_iid_dependence_factor_near_one(self, rng):
        x = rng.standard_normal(10000)
        r = mdt.rafterydiag(x)
        assert r.thinning == 1
        assert r.nmin == 3746  # ceil(0.025*0.975*(phi/0.005)^2) for s=0.95
        assert 0.5 < r.dependencefactor < 2.0
        assert r.total == r.burnin + (r.total - r.burnin)

    def test_autocorrelated_needs_more(self, rng):
        x = ref_impl.ar1_matrix(rng, 0.95, 1.0, (20000,))
        r_iid = mdt.rafterydiag(rng.standard_normal(20000))
        r_ar = mdt.rafterydiag(x)
        assert r_ar.dependencefactor > r_iid.dependencefactor
        assert r_ar.total > r_iid.total

    def test_too_few_samples_warns(self, rng):
        with pytest.warns(UserWarning, match="samples are needed"):
            r = mdt.rafterydiag(rng.standard_normal(100))
        assert r.thinning == -1
        assert np.isnan(r.burnin) and np.isnan(r.total)
        assert np.isnan(r.dependencefactor)

    def test_range_step_scales_thinning(self, rng):
        x = ref_impl.ar1_matrix(rng, 0.9, 1.0, (20000,))
        r1 = mdt.rafterydiag(x)
        r3 = mdt.rafterydiag(x, range_step=3)
        assert r3.thinning == 3 * r1.thinning
