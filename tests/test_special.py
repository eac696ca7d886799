"""Device-side special functions vs SciPy oracles."""

import numpy as np
import pytest
from scipy import special as sps
from scipy import stats as spstats

from mcmcdiagnostictools_jl_tpu.ops.special import (
    besselk_quarter,
    betaincinv,
    fdist_quantile,
    pcramer,
)


class TestBetaincinv:
    @pytest.mark.parametrize("a,b", [(0.5, 0.5), (2.0, 3.0), (50.0, 120.0),
                                     (1001.0, 3001.0), (5.0, 0.7)])
    def test_matches_scipy(self, a, b):
        y = np.linspace(0.001, 0.999, 41)
        got = np.asarray(betaincinv(a, b, y))
        want = sps.betaincinv(a, b, y)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_edges(self):
        assert betaincinv(2.0, 3.0, 0.0) == 0.0
        assert betaincinv(2.0, 3.0, 1.0) == 1.0
        assert np.isnan(np.asarray(betaincinv(np.nan, 3.0, 0.5)))

    @pytest.mark.parametrize("S,p", [(10_000, 0.5), (160_000, 0.5),
                                     (160_000, 0.25), (1_000_000, 0.9)])
    def test_f32_large_params(self, S, p):
        """f32 inputs with min(a,b) >= 2e3 take the Cornish-Fisher branch:
        accuracy must hold to ~1e-3 of the distribution's sigma, where f32
        bisection was off by sigma-scale amounts (betaln cancellation)."""
        a = np.float32(S * p + 1.0)
        b = np.float32(S * (1 - p) + 1.0)
        sig = np.sqrt(float(a) * float(b)
                      / ((float(a) + float(b)) ** 2 * (float(a) + float(b) + 1)))
        for y in (spstats.norm.cdf(-1.0), spstats.norm.cdf(1.0), 0.975):
            got = float(np.asarray(
                betaincinv(np.float32(a), np.float32(b), np.float32(y))
            ))
            want = float(sps.betaincinv(float(a), float(b), float(y)))
            assert abs(got - want) <= 2e-3 * sig, (y, got, want, sig)

    def test_f32_small_params_still_bisect(self):
        """Below the threshold, f32 arrays keep the bisection path and match
        SciPy to f32 resolution."""
        y = np.linspace(0.01, 0.99, 21).astype(np.float32)
        got = np.asarray(betaincinv(np.float32(5.0), np.float32(17.0), y))
        want = sps.betaincinv(5.0, 17.0, y.astype(np.float64))
        np.testing.assert_allclose(got, want, atol=2e-6)


class TestFQuantile:
    @pytest.mark.parametrize("d1,d2", [(3, 10), (1, 1), (7, 200.5), (40, 2)])
    def test_matches_scipy(self, d1, d2):
        q = np.array([0.5, 0.9, 0.975, 0.999])
        got = np.asarray(fdist_quantile(float(d1), float(d2), q))
        want = spstats.f.ppf(q, d1, d2)
        np.testing.assert_allclose(got, want, rtol=1e-9)


class TestBesselK:
    def test_matches_scipy(self):
        x = np.concatenate([np.geomspace(1e-4, 1.0, 25), np.linspace(1.5, 80, 25)])
        got = np.asarray(besselk_quarter(x))
        want = sps.kv(0.25, x)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_nonpositive_nan(self):
        assert np.isnan(np.asarray(besselk_quarter(0.0)))


class TestPcramer:
    def test_against_direct_series(self):
        # independent evaluation of the Csorgo-Faraway series with scipy pieces
        def ref(q):
            p = 0.0
            for k in range(4):
                c1 = 4.0 * k + 1.0
                c2 = c1**2 / (16.0 * q)
                p += (
                    sps.gamma(k + 0.5)
                    / sps.factorial(k)
                    * np.sqrt(c1)
                    * np.exp(-c2)
                    * sps.kv(0.25, c2)
                )
            return p / (np.pi**1.5 * np.sqrt(q))

        q = np.array([0.02, 0.05, 0.1, 0.3, 0.5, 1.0, 2.0])
        got = np.asarray(pcramer(q))
        want = np.array([ref(v) for v in q])
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_cdf_monotone(self):
        # the truncated 4-term series (same as the reference's) dips ~1e-7
        # below 1 in the far tail, so monotonicity is only checked to that tol
        q = np.linspace(0.02, 3.0, 50)
        p = np.asarray(pcramer(q))
        assert np.all(np.diff(p) >= -1e-6)
        assert p[-1] < 1.0 + 1e-9 and p[0] > 0.0
