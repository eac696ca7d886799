"""discretediag tests: kernel parity vs loop oracles + end-to-end behavior
(mirrors reference test/discretediag.jl plus statistical checks)."""

import numpy as np
import pytest

import ref_impl
import mcmcdiagnostictools_jl_tpu as mdt
from mcmcdiagnostictools_jl_tpu.diagnostics import discretediag as dd

METHODS = ("weiss", "hangartner", "DARBOOT", "MCBOOT", "billingsley",
           "billingsleyBOOT")


class TestKernels:
    def test_counts_match_loop(self, rng):
        y = rng.integers(0, 5, size=(200, 3))
        u, v, f = ref_impl.discrete_counts_loop(y, 5)
        np.testing.assert_array_equal(dd._counts_u(y, 5), u)
        np.testing.assert_array_equal(dd._counts_v(y, 5), v)
        np.testing.assert_array_equal(dd._counts_f_reversed(y, 5), f)

    def test_weiss_sub_matches_loop(self, rng):
        y = rng.integers(0, 4, size=(150, 3))
        u, v, _ = ref_impl.discrete_counts_loop(y, 4)
        want = ref_impl.weiss_sub_loop(u, v, 150)
        got = dd._weiss_sub(u, v, 150)
        np.testing.assert_allclose(got[0], want[0], rtol=1e-12)
        np.testing.assert_allclose(got[1], want[1], rtol=1e-12)
        assert got[2] == want[2]

    def test_weiss_sub_with_empty_category(self, rng):
        y = rng.integers(0, 3, size=(100, 2))
        # category 3 never occurs (m = 4)
        u, v, _ = ref_impl.discrete_counts_loop(y, 4)
        want = ref_impl.weiss_sub_loop(u, v, 100)
        got = dd._weiss_sub(u, v, 100)
        np.testing.assert_allclose(got[1], want[1], rtol=1e-12)
        assert got[2] == want[2] == 3

    def test_billingsley_sub_matches_loop(self, rng):
        y = rng.integers(0, 4, size=(150, 3))
        _, _, f = ref_impl.discrete_counts_loop(y, 4)
        want = ref_impl.billingsley_sub_loop(f)
        got = dd._billingsley_sub(f)
        np.testing.assert_allclose(got[0], want[0], rtol=1e-12)
        assert got[1] == want[1]
        np.testing.assert_allclose(got[2], want[2], rtol=1e-12)

    def test_billingsley_batch_consistent(self, rng):
        ys = rng.integers(0, 3, size=(5, 100, 2))
        fb = dd._batch_counts_f(ys, 3)
        s_b, d_b, _ = dd._billingsley_sub(fb)
        for i in range(5):
            _, _, fi = ref_impl.discrete_counts_loop(ys[i], 3)
            # batch tensors are (from, to); loop builds (to, from)
            want = ref_impl.billingsley_sub_loop(fi.transpose(1, 0, 2))
            np.testing.assert_allclose(s_b[i], want[0], rtol=1e-12)
            assert d_b[i] == want[1]


class TestEndToEnd:
    @pytest.mark.parametrize("method", METHODS)
    def test_shapes(self, rng, method):
        x = rng.integers(-100, 101, size=(100, 2, 4))
        res = mdt.discretediag(x, method=method, nsim=50, rng=0)
        assert res.between_chain.stat.shape == (4,)
        assert res.between_chain.df.shape == (4,)
        assert res.between_chain.pvalue.shape == (4,)
        assert res.within_chain.stat.shape == (4, 2)
        assert res.within_chain.pvalue.shape == (4, 2)

    @pytest.mark.parametrize("method", ["weiss", "hangartner", "billingsley"])
    def test_same_distribution_high_pvalue(self, rng, method):
        # identically-distributed categorical chains: should not be flagged
        x = rng.integers(0, 4, size=(1000, 4, 3)).astype(float)
        res = mdt.discretediag(x, method=method)
        assert np.all(res.between_chain.pvalue > 0.001)

    @pytest.mark.parametrize("method", ["weiss", "hangartner", "billingsley"])
    def test_different_distributions_flagged(self, rng, method):
        x = np.concatenate(
            [
                rng.choice(3, size=(1000, 2, 2), p=[0.8, 0.1, 0.1]),
                rng.choice(3, size=(1000, 2, 2), p=[0.1, 0.1, 0.8]),
            ],
            axis=1,
        ).astype(float)
        res = mdt.discretediag(x, method=method)
        assert np.all(res.between_chain.pvalue < 0.01)

    @pytest.mark.parametrize("method", ["DARBOOT", "billingsleyBOOT"])
    def test_bootstrap_methods_sane(self, rng, method):
        x = rng.integers(0, 3, size=(300, 3, 2)).astype(float)
        res = mdt.discretediag(x, method=method, nsim=200, rng=1)
        assert np.all(res.between_chain.pvalue > 0.001)
        assert np.all(np.isfinite(res.between_chain.df))

    def test_mcboot_reference_quirk(self, rng):
        # the reference never assigns `stat` in the :MCBOOT branch
        # (src/discretediag.jl:329-337): stat is NaN and pvalue 0.0
        x = rng.integers(0, 3, size=(200, 2, 1)).astype(float)
        res = mdt.discretediag(x, method="MCBOOT", nsim=50, rng=0)
        assert np.all(np.isnan(res.between_chain.stat))
        assert np.all(res.between_chain.pvalue == 0.0)

    def test_errors(self, rng):
        x = rng.integers(0, 3, size=(100, 2, 1))
        with pytest.raises(ValueError):
            mdt.discretediag(x, method="somemethod")
        for frac in (-0.3, 0.0, 1.0, 1.2):
            with pytest.raises(ValueError):
                mdt.discretediag(x, frac=frac)

    @pytest.mark.parametrize("method", ["weiss", "hangartner", "billingsley"])
    def test_slicing_invariance(self, rng, method):
        # a parameter computed alone (m_pad = its own m) must match the same
        # parameter inside a batch whose m_pad is the max across params —
        # catches category-padding errors in the batched driver
        x = np.concatenate(
            [rng.integers(0, 3, size=(150, 3, 2)),
             rng.integers(0, 7, size=(150, 3, 1))], axis=2
        ).astype(float)
        full = mdt.discretediag(x, method=method)
        for j in range(3):
            single = mdt.discretediag(x[:, :, j : j + 1], method=method)
            np.testing.assert_allclose(
                single.between_chain.stat[0], full.between_chain.stat[j],
                rtol=1e-12)
            np.testing.assert_allclose(
                single.within_chain.pvalue[0], full.within_chain.pvalue[j],
                rtol=1e-12)

    def test_deterministic_with_seed(self, rng):
        x = rng.integers(0, 3, size=(200, 2, 2)).astype(float)
        a = mdt.discretediag(x, method="DARBOOT", nsim=100, rng=7)
        b = mdt.discretediag(x, method="DARBOOT", nsim=100, rng=7)
        np.testing.assert_array_equal(a.between_chain.pvalue, b.between_chain.pvalue)
