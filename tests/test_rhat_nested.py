"""rhat_nested parity + behavior tests (mirrors reference test/rhat_nested.jl)."""

import numpy as np
import pytest

import ref_impl
import mcmcdiagnostictools_jl_tpu as mdt

TOL = dict(rtol=1e-9, atol=1e-9)


class TestParity:
    @pytest.mark.parametrize("kind", ["rank", "bulk", "tail", "basic"])
    @pytest.mark.parametrize("split_chains", [1, 2])
    def test_oracle(self, rng, kind, split_chains):
        x = rng.standard_normal((101, 8, 3))
        ids = np.repeat([1, 2, 3, 4], 2)
        got = np.asarray(
            mdt.rhat_nested(x, ids, kind=kind, split_chains=split_chains)
        )
        want = ref_impl.rhat_nested(x, ids, kind=kind, split_chains=split_chains)
        np.testing.assert_allclose(got, want, **TOL)


class TestBehavior:
    def test_label_invariance(self, rng):
        # reference test/rhat_nested.jl:101-110
        x = rng.standard_normal((100, 4, 10))
        a = np.asarray(mdt.rhat_nested(x, [1, 1, 2, 2]))
        b = np.asarray(mdt.rhat_nested(x, [42, 42, 99, 99]))
        np.testing.assert_array_equal(a, b)

    def test_permutation_invariance(self, rng):
        # reference test/rhat_nested.jl:112-129
        nsuper, cps = 8, 4
        nchains = nsuper * cps
        x = rng.standard_normal((100, nchains, 5))
        ids = np.repeat(np.arange(1, nsuper + 1), cps)
        perm = rng.permutation(nchains)
        for kind in ("rank", "bulk", "tail", "basic"):
            a = np.asarray(mdt.rhat_nested(x, ids, kind=kind))
            b = np.asarray(mdt.rhat_nested(x[:, perm], ids[perm], kind=kind))
            np.testing.assert_allclose(a, b, rtol=1e-12)

    @pytest.mark.parametrize("ndraws", [10, 20])
    @pytest.mark.parametrize("kind", ["basic", "bulk", "tail"])
    def test_consistency_with_rhat(self, rng, ndraws, kind):
        # one chain per superchain, no splitting: Rn^2 = R^2 + 1/ndraws
        # (reference test/rhat_nested.jl:131-146)
        nchains = 8
        x = rng.standard_normal((ndraws, nchains, 10))
        ids = np.arange(1, nchains + 1)
        rn = np.asarray(mdt.rhat_nested(x, ids, kind=kind, split_chains=1))
        rs = np.asarray(mdt.rhat(x, kind=kind, split_chains=1))
        np.testing.assert_allclose(rn, np.sqrt(rs**2 + 1 / ndraws), rtol=1e-10)

    def test_rank_is_max(self, rng):
        x = rng.standard_normal((100, 4, 10))
        ids = [1, 1, 2, 2]
        rb = np.asarray(mdt.rhat_nested(x, ids, kind="bulk"))
        rt = np.asarray(mdt.rhat_nested(x, ids, kind="tail"))
        rr = np.asarray(mdt.rhat_nested(x, ids, kind="rank"))
        np.testing.assert_array_equal(rr, np.maximum(rb, rt))

    def test_iid_near_one(self, rng):
        x = rng.standard_normal((100, 64, 4))
        ids = np.repeat(np.arange(8), 8)
        r = np.asarray(mdt.rhat_nested(x, ids))
        assert np.all(np.abs(r - 1) < 0.05)

    def test_nonconverged_flagged(self, rng):
        # superchains at different locations
        x = rng.standard_normal((100, 8, 2))
        x[:, 4:, :] += 5.0
        ids = [1, 1, 1, 1, 2, 2, 2, 2]
        r = np.asarray(mdt.rhat_nested(x, ids))
        assert np.all(r > 1.2)

    def test_identical_nan(self):
        x = np.full((100, 4, 1), 1.5)
        r = np.asarray(mdt.rhat_nested(x, [1, 1, 2, 2], kind="basic"))
        assert np.isnan(r).all()

    def test_errors(self, rng):
        x = rng.standard_normal((100, 4))
        with pytest.raises(ValueError):
            mdt.rhat_nested(x, [1, 1, 2])  # length mismatch
        with pytest.raises(ValueError):
            mdt.rhat_nested(x, [1, 1, 1, 1])  # only one superchain
        with pytest.raises(ValueError):
            mdt.rhat_nested(x, [1, 1, 1, 2])  # unequal sizes
        with pytest.raises(ValueError):
            mdt.rhat_nested(rng.standard_normal(100), [1])  # 1-d samples
        with pytest.raises(ValueError):
            mdt.rhat_nested(x, [1, 1, 2, 2], kind="bogus")
