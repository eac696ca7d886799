"""Statistical correctness on synthetic processes with known asymptotics.

Mirrors the reference's workhorse strategy (test/ess_rhat.jl:278-312,
test/mcse.jl:103-134, per SURVEY.md section 4.3): draw AR(1) chains, map them
through monotone transforms to known target distributions, and assert that
each estimator lands within an MCSE-derived tolerance of the true estimand —
plus the AR(1) closed-form ESS check ``ess/n -> (1-phi)/(1+phi)``.
"""

import numpy as np
import pytest
from scipy import stats as spstats

import ref_impl
import mcmcdiagnostictools_jl_tpu as mdt
from mcmcdiagnostictools_jl_tpu import Quantile

Z = 5.0  # generous z-score bound; deterministic seeds keep this stable


def _ar1_uniform(rng, phi, shape):
    """AR(1) chains mapped to U(0,1) via the exact stationary normal CDF."""
    x = ref_impl.ar1_matrix(rng, phi, 1.0, shape)
    sd = 1.0 / np.sqrt(1.0 - phi**2)
    return spstats.norm.cdf(x / sd)


CASES = [
    ("normal", spstats.norm(2.0, 3.0)),
    ("exponential", spstats.expon(scale=2.0)),
    ("tdist", spstats.t(df=7)),
]


@pytest.mark.parametrize("phi", [-0.3, 0.3, 0.7])
@pytest.mark.parametrize("name,dist", CASES, ids=[c[0] for c in CASES])
class TestEstimatorsWithinMCSE:
    shape = (2000, 4)

    def _draws(self, rng, phi, dist):
        u = _ar1_uniform(rng, phi, self.shape)
        return dist.ppf(u)  # monotone transform preserves rank structure

    def test_mean(self, rng, phi, name, dist):
        y = self._draws(rng, phi, dist)
        se = mdt.mcse(y, kind="mean")
        assert abs(np.mean(y) - dist.mean()) < Z * se

    def test_median(self, rng, phi, name, dist):
        y = self._draws(rng, phi, dist)
        se = mdt.mcse(y, kind="median")
        assert abs(np.median(y) - dist.ppf(0.5)) < Z * se

    def test_std(self, rng, phi, name, dist):
        y = self._draws(rng, phi, dist)
        se = mdt.mcse(y, kind="std")
        assert abs(np.std(y, ddof=1) - dist.std()) < Z * se

    @pytest.mark.parametrize("p", [0.25, 0.9])
    def test_quantile(self, rng, phi, name, dist, p):
        y = self._draws(rng, phi, dist)
        se = mdt.mcse(y, kind=Quantile(p))
        est = np.quantile(y.reshape(-1), p)
        assert abs(est - dist.ppf(p)) < Z * se


class TestAR1ClosedFormESS:
    @pytest.mark.parametrize("phi", [0.1, 0.5, 0.8])
    def test_relative_ess_matches_theory(self, rng, phi):
        # for AR(1), tau = (1+phi)/(1-phi); ess/n -> (1-phi)/(1+phi)
        n, c = 20000, 8
        x = ref_impl.ar1_matrix(rng, phi, 1.0, (n, c))
        rel = mdt.ess(x, kind="basic", relative=True, maxlag=1000)
        theory = (1 - phi) / (1 + phi)
        assert abs(rel - theory) < 0.15 * theory

    @pytest.mark.parametrize("phi", [-0.5])
    def test_antithetic_ess_exceeds_n(self, rng, phi):
        # negative autocorrelation: super-efficient, ess > ntotal
        x = ref_impl.ar1_matrix(rng, phi, 1.0, (10000, 4))
        rel = mdt.ess(x, kind="basic", relative=True)
        assert rel > 1.0


class TestRhatCalibration:
    def test_independent_chains_rhat_below_threshold(self, rng):
        # converged chains must pass the 1.01 recommendation
        x = ref_impl.ar1_matrix(rng, 0.3, 1.0, (5000, 4, 10))
        r = np.asarray(mdt.rhat(x))
        assert np.all(r < 1.01)

    def test_rhat_increases_with_shift(self, rng):
        x = ref_impl.ar1_matrix(rng, 0.3, 1.0, (1000, 4))
        shifts = [0.0, 0.5, 2.0, 8.0]
        vals = []
        for s in shifts:
            xs = x.copy()
            xs[:, 0] += s
            vals.append(mdt.rhat(xs))
        assert vals == sorted(vals)
