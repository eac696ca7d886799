"""R* tests (mirrors reference test/rstar.jl scenarios) + GBT + PoissonBinomial."""

import numpy as np
import pytest

import mcmcdiagnostictools_jl_tpu as mdt
from mcmcdiagnostictools_jl_tpu.models import (
    GBTClassifier,
    ScaledPoissonBinomial,
    deterministic,
)


def _fast_clf(**kw):
    return GBTClassifier(n_rounds=30, max_depth=3, n_bins=32, **kw)


class TestPoissonBinomial:
    def test_matches_binomial(self):
        from scipy.stats import binom

        d = ScaledPoissonBinomial(np.full(50, 0.3), 1.0)
        k = np.arange(51)
        np.testing.assert_allclose(d.pdf(k.astype(float)), binom.pmf(k, 50, 0.3),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(d.mean(), 15.0)
        np.testing.assert_allclose(d.var(), 50 * 0.3 * 0.7)

    def test_heterogeneous_probs(self):
        rng = np.random.default_rng(0)
        p = rng.random(200)
        d = ScaledPoissonBinomial(p, 0.5)
        assert abs(d.mean() - 0.5 * p.sum()) < 1e-10
        np.testing.assert_allclose(d.pdf(d.support()).sum(), 1.0, rtol=1e-12)
        assert d.cdf(d.support()[-1]) == pytest.approx(1.0)

    def test_scaling(self):
        p = np.array([0.2, 0.8, 0.5])
        a = ScaledPoissonBinomial(p, 1.0)
        b = ScaledPoissonBinomial(p, 2.0)
        assert b.mean() == pytest.approx(2 * a.mean())
        assert b.std() == pytest.approx(2 * a.std())


class TestRstar:
    def test_mixed_chains_near_one(self, rng):
        # same distribution in every chain: R* ~ 1 (classifier at chance)
        x = rng.standard_normal((400, 4, 2))
        dist = mdt.rstar(_fast_clf(), x, rng=0)
        assert isinstance(dist, ScaledPoissonBinomial)
        assert 0.5 < dist.mean() < 1.6

    def test_separated_chains_near_nchains(self, rng):
        # chains at distinct locations: classifier identifies the chain but
        # not the split within it -> R* ~ nchains (reference test/rstar.jl)
        nchains = 4
        x = rng.standard_normal((400, nchains, 2)) * 0.1
        x += np.arange(nchains)[None, :, None] * 10.0
        dist = mdt.rstar(_fast_clf(), x, rng=0)
        assert dist.mean() > 0.7 * nchains

    def test_deterministic_classifier(self, rng):
        x = rng.standard_normal((300, 3, 2))
        val = mdt.rstar(deterministic(_fast_clf()), x, rng=0)
        assert isinstance(val, float)
        assert 0.0 <= val <= 6.0  # nclasses = 6 after split

    def test_constant_samples(self):
        # reference doctest: constant samples -> R* distribution with mean ~ 1
        x = np.full((100, 3, 2), 4.0)
        dist = mdt.rstar(_fast_clf(), x, rng=0)
        assert dist.mean() == pytest.approx(1.0, rel=0.3)

    def test_matrix_plus_chain_indices_ragged(self, rng):
        rows = rng.standard_normal((350, 2))
        ids = np.concatenate([np.full(200, 1), np.full(150, 2)])
        dist = mdt.rstar(_fast_clf(), rows, ids, rng=0)
        assert 0.3 < dist.mean() < 2.0

    def test_vector_input(self, rng):
        x = rng.standard_normal(300)
        dist = mdt.rstar(_fast_clf(), x, rng=0)
        # single chain -> split into 2 classes
        assert 0.3 < dist.mean() < 2.0

    def test_default_classifier(self, rng):
        x = rng.standard_normal((200, 2, 1))
        dist = mdt.rstar(None, x, rng=0)
        assert isinstance(dist, ScaledPoissonBinomial)

    def test_split_chains_1(self, rng):
        nchains = 3
        x = rng.standard_normal((300, nchains, 1)) * 0.1
        x += np.arange(nchains)[None, :, None] * 5.0
        dist = mdt.rstar(_fast_clf(), x, split_chains=1, rng=0)
        # without splitting, classes are fully separable -> R* ~ nclasses
        assert dist.mean() > 0.8 * nchains

    def test_errors(self, rng):
        x = rng.standard_normal((100, 2, 1))
        with pytest.raises(ValueError):
            mdt.rstar(_fast_clf(), x, subset=0.0)
        with pytest.raises(ValueError):
            mdt.rstar(_fast_clf(), x, subset=1.0)
        with pytest.raises(ValueError):
            mdt.rstar(_fast_clf(), rng.standard_normal((100, 2)),
                      np.ones(99, dtype=int))

    def test_seed_reproducible(self, rng):
        x = rng.standard_normal((200, 3, 2))
        a = mdt.rstar(_fast_clf(), x, rng=42)
        b = mdt.rstar(_fast_clf(), x, rng=42)
        assert a.mean() == pytest.approx(b.mean(), abs=1e-12)
