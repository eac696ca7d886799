"""GBT classifier quality vs sklearn HistGradientBoosting (SURVEY §7).

The reference requires its R* classifier seam to reach "accuracy comparable
to EvoTrees" (reference test/rstar.jl exercises EvoTrees/XGBoost). EvoTrees
is a Julia histogram-GBT; sklearn's HistGradientBoostingClassifier is the
same algorithm family and is the strongest oracle available in this
environment, so the bar here is: on identical train/test splits, the
on-device GBT's holdout accuracy must be within a few points of sklearn's
on each R* scenario (mixed chains ~ chance, separated chains ~ 1.0, and a
partially-separable mid case standing in for the 8-schools trace).
"""

import numpy as np
import pytest

from mcmcdiagnostictools_jl_tpu.models import GBTClassifier

pytestmark = pytest.mark.slow


def _split(rng, n):
    perm = rng.permutation(n)
    ntr = int(round(n * 0.7))
    return perm[:ntr], perm[ntr:]


def _accuracy_pair(x, y, num_classes, seed=0, n_rounds=80):
    """(gbt_acc, sklearn_acc) on one shared 70/30 split."""
    from sklearn.ensemble import HistGradientBoostingClassifier

    rng = np.random.default_rng(seed)
    tr, te = _split(rng, len(y))
    xtr, ytr, xte, yte = x[tr], y[tr], x[te], y[te]

    clf = GBTClassifier(n_rounds=n_rounds, max_depth=3, n_bins=32)
    state = clf.fit(xtr, ytr, num_classes)
    acc_gbt = float(np.mean(np.asarray(clf.predict(state, xte)) == yte))

    skl = HistGradientBoostingClassifier(
        max_iter=n_rounds, max_depth=3, max_bins=32, random_state=0
    )
    skl.fit(xtr, ytr)
    acc_skl = float(np.mean(skl.predict(xte) == yte))
    return acc_gbt, acc_skl


class TestGBTvsSklearn:
    """Failing-if-regressed accuracy comparisons (VERDICT r2 item 5)."""

    def test_mixed_chains_chance_level(self):
        # identical distribution in every class: both classifiers must sit
        # at chance (no spurious memorization advantage either way)
        rng = np.random.default_rng(1)
        k, n = 8, 2400
        x = rng.standard_normal((n, 4))
        y = rng.integers(0, k, n)
        acc_gbt, acc_skl = _accuracy_pair(x, y, k, seed=1)
        assert abs(acc_gbt - 1.0 / k) < 0.06, (acc_gbt, acc_skl)
        assert abs(acc_gbt - acc_skl) < 0.06, (acc_gbt, acc_skl)

    def test_separated_chains_near_perfect(self):
        # well-separated clusters (the R* "non-mixed" scenario): both ~ 1.0
        rng = np.random.default_rng(2)
        k, per = 6, 400
        x = rng.standard_normal((k * per, 3)) * 0.1
        y = np.repeat(np.arange(k), per)
        x += y[:, None] * 2.0
        acc_gbt, acc_skl = _accuracy_pair(x, y, k, seed=2)
        assert acc_gbt > 0.98, (acc_gbt, acc_skl)
        assert acc_gbt >= acc_skl - 0.03, (acc_gbt, acc_skl)

    def test_partially_separable(self):
        # overlapping mixture (location shift ~ 1 sd, like a drifting
        # posterior): the discriminative regime where tree quality shows.
        rng = np.random.default_rng(3)
        k, per = 4, 700
        y = np.repeat(np.arange(k), per)
        x = rng.standard_normal((k * per, 5))
        x[:, :2] += y[:, None] * 1.0
        acc_gbt, acc_skl = _accuracy_pair(x, y, k, seed=3)
        assert acc_gbt >= acc_skl - 0.05, (acc_gbt, acc_skl)

    def test_eight_schools_style_trace(self):
        # AR(1)-correlated 10-param chains with per-chain location offsets of
        # ~0.8 sd — the shape of a real not-quite-converged 8-schools run.
        rng = np.random.default_rng(4)
        k, draws, p = 8, 300, 10
        eps = rng.standard_normal((draws, k, p))
        x = np.empty_like(eps)
        x[0] = eps[0]
        for t in range(1, draws):
            x[t] = 0.7 * x[t - 1] + np.sqrt(1 - 0.49) * eps[t]
        x += (rng.standard_normal((1, k, p)) * 0.8)
        y = np.broadcast_to(np.arange(k)[None, :], (draws, k)).reshape(-1)
        xm = x.reshape(-1, p)
        acc_gbt, acc_skl = _accuracy_pair(xm, y.copy(), k, seed=4)
        assert acc_gbt >= acc_skl - 0.05, (acc_gbt, acc_skl)

    def test_streaming_class_chunk_matches_dense(self):
        # the class-chunked streaming fit (many-chain path) must agree with
        # the dense fit on identical data — same splits, same accuracy
        rng = np.random.default_rng(5)
        k, per = 6, 200
        y = np.repeat(np.arange(k), per)
        x = rng.standard_normal((k * per, 4)) + y[:, None] * 0.7
        tr = slice(0, 900)
        te = slice(900, None)
        dense = GBTClassifier(n_rounds=25, n_bins=32, class_chunk=-1)
        chunked = GBTClassifier(n_rounds=25, n_bins=32, class_chunk=2)
        sd = dense.fit(x[tr], y[tr], k)
        sc = chunked.fit(x[tr], y[tr], k)
        pd_ = np.asarray(dense.predict(sd, x[te]))
        pc_ = np.asarray(chunked.predict(sc, x[te]))
        # the two paths reduce logits in different orders (argmax vs running
        # max over class chunks), so compare labels only where the dense
        # logits have a unique maximizer — an exact float tie may legally
        # break either way (ADVICE round 3)
        ld = np.asarray(dense.predict_logits(sd, x[te]))
        sorted_logits = np.sort(ld, axis=1)
        untied = sorted_logits[:, -1] > sorted_logits[:, -2]
        assert untied.mean() > 0.99
        np.testing.assert_array_equal(pd_[untied], pc_[untied])
