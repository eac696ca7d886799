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

    def test_fft_tree_matches_dp(self):
        # the large-n FFT polynomial-product pmf must agree with the exact
        # O(n^2) DP (round-4: pmf is lazy + subquadratic)
        from mcmcdiagnostictools_jl_tpu.models.poisson_binomial import (
            _poisson_binomial_pmf_dp,
            _poisson_binomial_pmf_fft,
        )

        rng = np.random.default_rng(3)
        for n in (2, 3, 65, 1000):
            p = rng.uniform(0, 1, n)
            np.testing.assert_allclose(
                _poisson_binomial_pmf_fft(p),
                _poisson_binomial_pmf_dp(p),
                rtol=0, atol=1e-12,
            )

    def test_pmf_is_lazy(self):
        # construction and moments must not materialize the pmf
        d = ScaledPoissonBinomial(np.full(100_000, 0.5), 1.0)
        assert d._pmf_cache is None
        d.mean(), d.var(), d.std()
        assert d._pmf_cache is None
        d.pdf(50_000.0)
        assert d._pmf_cache is not None


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


class TestShardedGBT:
    """Data-parallel fit over the 8-device CPU mesh == single-device fit."""

    def _data(self, rng, n=2000, nf=4, k=10):
        x = rng.standard_normal((n, nf)).astype(np.float32)
        y = rng.integers(0, k, n)
        x[:, 0] += y * 0.4
        return x, y, k

    def test_sharded_fit_matches_single(self, rng):
        import jax

        from mcmcdiagnostictools_jl_tpu.models.gbt import ShardedGBTClassifier

        x, y, k = self._data(rng)
        single = GBTClassifier(n_rounds=10, n_bins=16)
        sharded = ShardedGBTClassifier(
            n_rounds=10, n_bins=16,
            devices=tuple(jax.local_devices(backend="cpu")[:8]),
        )
        s1 = single.fit(x, y, k)
        s2 = sharded.fit(x, y, k)
        np.testing.assert_array_equal(
            np.asarray(s1.split_feature), np.asarray(s2.split_feature)
        )
        np.testing.assert_array_equal(
            np.asarray(s1.split_bin), np.asarray(s2.split_bin)
        )
        np.testing.assert_allclose(
            np.asarray(s1.leaf_value), np.asarray(s2.leaf_value), atol=5e-6
        )
        np.testing.assert_array_equal(
            np.asarray(single.predict(s1, x)), np.asarray(sharded.predict(s2, x))
        )

    def test_sharded_fit_row_padding(self, rng):
        import jax

        from mcmcdiagnostictools_jl_tpu.models.gbt import ShardedGBTClassifier

        x, y, k = self._data(rng, n=1997)  # not divisible by 8
        sharded = ShardedGBTClassifier(
            n_rounds=6, n_bins=16,
            devices=tuple(jax.local_devices(backend="cpu")[:8]),
        )
        single = GBTClassifier(n_rounds=6, n_bins=16)
        s1 = single.fit(x, y, k)
        s2 = sharded.fit(x, y, k)
        np.testing.assert_array_equal(
            np.asarray(s1.split_feature), np.asarray(s2.split_feature)
        )
        np.testing.assert_allclose(
            np.asarray(s1.leaf_value), np.asarray(s2.leaf_value), atol=5e-6
        )

    def test_rstar_with_sharded_classifier(self, rng):
        import jax

        from mcmcdiagnostictools_jl_tpu.models.gbt import ShardedGBTClassifier

        nchains = 4
        x = rng.standard_normal((400, nchains, 2)) * 0.1
        x += np.arange(nchains)[None, :, None] * 10.0
        clf = ShardedGBTClassifier(
            n_rounds=30, n_bins=32,
            devices=tuple(jax.local_devices(backend="cpu")[:8]),
        )
        dist = mdt.rstar(clf, x, rng=0)
        assert dist.mean() > 0.7 * nchains


class TestBigKGBT:
    """Class-chunked streaming fit/predict == dense fit/predict."""

    def test_bigk_matches_dense(self, rng):
        n, nf, k = 3000, 4, 12
        x = rng.standard_normal((n, nf)).astype(np.float32)
        y = rng.integers(0, k, n)
        x[:, 0] += y * 0.5
        dense = GBTClassifier(n_rounds=12, n_bins=16, class_chunk=-1)
        bigk = GBTClassifier(n_rounds=12, n_bins=16, class_chunk=5)
        s1 = dense.fit(x, y, k)
        s2 = bigk.fit(x, y, k)
        np.testing.assert_array_equal(
            np.asarray(s1.split_feature), np.asarray(s2.split_feature)
        )
        np.testing.assert_array_equal(
            np.asarray(s1.split_bin), np.asarray(s2.split_bin)
        )
        np.testing.assert_allclose(
            np.asarray(s1.leaf_value), np.asarray(s2.leaf_value), atol=5e-6
        )
        np.testing.assert_array_equal(
            np.asarray(dense.predict(s1, x)), np.asarray(bigk.predict(s2, x))
        )
        np.testing.assert_allclose(
            np.asarray(dense.predict_true_proba(s1, x, y)),
            np.asarray(bigk.predict_true_proba(s2, x, y)),
            atol=5e-6,
        )

    def test_rstar_many_chains_bigk(self, rng):
        # many-chain regime on a small scale: force the streaming path and
        # check the mixed-chain R* stays near 1
        x = rng.standard_normal((40, 64, 3))
        clf = GBTClassifier(n_rounds=8, n_bins=16, class_chunk=32)
        dist = mdt.rstar(clf, x, rng=0)
        assert 0.2 < dist.mean() < 2.5


class TestGBTAccuracyVsSklearn:
    """SURVEY section 7: GBT accuracy comparable to reference classifiers.

    sklearn's HistGradientBoostingClassifier is the same algorithm family as
    the reference's EvoTrees default (histogram GBT); holdout accuracy on the
    R* test scenarios must be within a few points.
    """

    def _holdout_acc(self, clf_fit_predict, x, y, rng):
        n = len(y)
        perm = rng.permutation(n)
        ntr = int(0.7 * n)
        tr, te = perm[:ntr], perm[ntr:]
        pred = clf_fit_predict(x[tr], y[tr], x[te])
        return float(np.mean(pred == y[te]))

    @pytest.mark.parametrize("scenario", ["mixed", "separated", "overlap"])
    def test_accuracy_close_to_sklearn(self, rng, scenario):
        from sklearn.ensemble import HistGradientBoostingClassifier

        nchains, ndraws = 4, 500
        x3 = rng.standard_normal((ndraws, nchains, 2))
        if scenario == "separated":
            x3 = x3 * 0.1 + np.arange(nchains)[None, :, None] * 10.0
        elif scenario == "overlap":
            x3 = x3 + np.arange(nchains)[None, :, None] * 1.0
        rows = np.transpose(x3, (1, 0, 2)).reshape(-1, 2)
        y = np.repeat(np.arange(nchains), ndraws)

        gbt = GBTClassifier(n_rounds=60, n_bins=32)

        def fit_gbt(xt, yt, xe):
            st = gbt.fit(xt, yt, nchains)
            return np.asarray(gbt.predict(st, xe))

        def fit_sk(xt, yt, xe):
            m = HistGradientBoostingClassifier(
                max_iter=60, max_depth=3, max_bins=32, random_state=0
            )
            m.fit(xt, yt)
            return m.predict(xe)

        acc_gbt = self._holdout_acc(fit_gbt, rows, y, rng)
        acc_sk = self._holdout_acc(fit_sk, rows, y, rng)
        # within 5 accuracy points of sklearn on every scenario
        assert acc_gbt >= acc_sk - 0.05, (scenario, acc_gbt, acc_sk)
