"""Golden-vector parity: the library vs stored float64 vectors produced by a
literal transcription of the reference Julia source (tests/golden/gen_golden.py,
a SEPARATE oracle from tests/ref_impl.py — see BASELINE.md parity bound 1e-6).

The vectors are pinned artifacts (tests/golden/golden.json); the generator is
never imported here, so library drift cannot silently regenerate them. Kinds
use the reference's default direct ``AutocovMethod`` (src/ess_rhat.jl:493),
pinned explicitly on the library side so the parity claim is method-accurate;
FFT/BDA estimators are pinned by the per-method basic-kind vectors.
"""

import json
import os

import numpy as np
import pytest

import mcmcdiagnostictools_jl_tpu as mdt
from mcmcdiagnostictools_jl_tpu import (
    AutocovMethod,
    BDAAutocovMethod,
    FFTAutocovMethod,
    Quantile,
)

TOL = 1e-6
_GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "golden.json")

_METHOD_OBJS = {
    "direct": AutocovMethod(),
    "fft": FFTAutocovMethod(),
    "bda": BDAAutocovMethod(),
}


@pytest.fixture(scope="module")
def gold():
    with open(_GOLD) as fh:
        return json.load(fh)


def _x(case):
    return np.asarray(case["x"], dtype=np.float64)


def assert_close(got, want, label):
    got = np.asarray(got, dtype=np.float64).reshape(-1)
    want = np.asarray(want, dtype=np.float64).reshape(-1)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want), err_msg=label)
    mask = ~np.isnan(want)
    # relative for large ESS magnitudes, absolute near-1 for rhat
    denom = np.maximum(1.0, np.abs(want[mask]))
    assert np.max(np.abs(got[mask] - want[mask]) / denom) < TOL, label


class TestESSRhatGolden:
    @pytest.mark.parametrize("case_name", ["iid_1000x4x8", "ar1_1001x3x5"])
    @pytest.mark.parametrize("kind", ["rank", "bulk", "tail", "basic"])
    def test_ess_rhat_kinds(self, gold, case_name, kind):
        c = gold[case_name]
        r = mdt.ess_rhat(_x(c), kind=kind, autocov_method=AutocovMethod())
        assert_close(r.ess, c[f"ess_rhat_{kind}_ess"], f"{case_name} ess {kind}")
        assert_close(r.rhat, c[f"ess_rhat_{kind}_rhat"], f"{case_name} rhat {kind}")

    @pytest.mark.parametrize("method", ["fft", "direct", "bda"])
    def test_basic_per_method(self, gold, method):
        c = gold["iid_1000x4x8"]
        r = mdt.ess_rhat(_x(c), kind="basic", autocov_method=_METHOD_OBJS[method])
        assert_close(r.ess, c[f"ess_basic_{method}"], f"basic ess {method}")
        assert_close(r.rhat, c[f"rhat_basic_{method}"], f"basic rhat {method}")

    @pytest.mark.parametrize("kind", ["mean", "median", "std", "mad"])
    def test_ess_estimators(self, gold, kind):
        c = gold["iid_1000x4x8"]
        got = mdt.ess(_x(c), kind=kind, autocov_method=AutocovMethod())
        assert_close(got, c[f"ess_{kind}"], f"ess {kind}")

    def test_ess_quantile(self, gold):
        c = gold["iid_1000x4x8"]
        got = mdt.ess(_x(c), kind=Quantile(0.25), autocov_method=AutocovMethod())
        assert_close(got, c["ess_quantile_0.25"], "ess quantile 0.25")

    def test_ess_tail_relative(self, gold):
        c = gold["iid_1000x4x8"]
        got = mdt.ess(
            _x(c), kind="tail", relative=True, autocov_method=AutocovMethod()
        )
        assert_close(got, c["ess_tail_relative"], "relative tail ess")

    @pytest.mark.parametrize("kind", ["rank", "bulk", "tail", "basic"])
    def test_rhat_kinds(self, gold, kind):
        c = gold["iid_1000x4x8"]
        assert_close(mdt.rhat(_x(c), kind=kind), c[f"rhat_{kind}"], f"rhat {kind}")

    def test_odd_draws_split3(self, gold):
        """split_chains=3 on 1001 draws exercises the remainder-discard rule."""
        c = gold["ar1_1001x3x5"]
        got = mdt.ess(
            _x(c), kind="basic", split_chains=3, autocov_method=AutocovMethod()
        )
        assert_close(got, c["ess_basic_split3"], "basic ess split3")
        assert_close(
            mdt.rhat(_x(c), kind="rank", split_chains=3),
            c["rhat_rank_split3"],
            "rank rhat split3",
        )

    def test_ar1_direct(self, gold):
        c = gold["ar1_1001x3x5"]
        got = mdt.ess(_x(c), kind="basic", autocov_method=AutocovMethod())
        assert_close(got, c["ess_basic_direct"], "ar1 direct basic ess")

    @pytest.mark.parametrize("kind", ["rank", "bulk", "tail"])
    def test_scale_mismatch(self, gold, kind):
        """Scale-mismatched chains: tail kinds must flag what bulk misses
        (reference test/ess_rhat.jl:337-364 scenario)."""
        c = gold["scalemix_600x4x3"]
        r = mdt.ess_rhat(_x(c), kind=kind, autocov_method=AutocovMethod())
        assert_close(r.ess, c[f"ess_rhat_{kind}_ess"], f"scalemix ess {kind}")
        assert_close(r.rhat, c[f"ess_rhat_{kind}_rhat"], f"scalemix rhat {kind}")

    def test_small_2d_scalar(self, gold):
        c = gold["small_11x2"]
        r = mdt.ess_rhat(_x(c), kind="rank", autocov_method=AutocovMethod())
        assert np.ndim(r.ess) == 0 and np.ndim(r.rhat) == 0
        assert_close(r.ess, c["ess_rhat_rank_ess"], "small rank ess")
        assert_close(r.rhat, c["ess_rhat_rank_rhat"], "small rank rhat")
        rb = mdt.ess_rhat(_x(c), kind="basic", autocov_method=AutocovMethod())
        assert_close(rb.ess, c["ess_basic_direct"], "small basic ess")
        assert_close(rb.rhat, c["rhat_basic"], "small basic rhat")


class TestMCSEGolden:
    def test_mean(self, gold):
        c = gold["iid_1000x4x8"]
        got = mdt.mcse(_x(c), kind="mean", autocov_method=AutocovMethod())
        assert_close(got, c["mcse_mean"], "mcse mean")

    def test_std(self, gold):
        c = gold["iid_1000x4x8"]
        got = mdt.mcse(_x(c), kind="std", autocov_method=AutocovMethod())
        assert_close(got, c["mcse_std"], "mcse std")

    def test_median(self, gold):
        c = gold["iid_1000x4x8"]
        got = mdt.mcse(_x(c), kind="median", autocov_method=AutocovMethod())
        assert_close(got, c["mcse_median"], "mcse median")

    def test_quantile(self, gold):
        c = gold["iid_1000x4x8"]
        got = mdt.mcse(_x(c), kind=Quantile(0.25), autocov_method=AutocovMethod())
        assert_close(got, c["mcse_quantile_0.25"], "mcse quantile 0.25")

    def test_sbm(self, gold):
        c = gold["iid_1000x4x8"]
        got = mdt.mcse(_x(c), kind=lambda v: jnp_mean(v))
        assert_close(got, c["mcse_sbm_mean"], "mcse sbm mean")

    def test_ar1_quantile(self, gold):
        c = gold["ar1_1001x3x5"]
        got = mdt.mcse(_x(c), kind=Quantile(0.1), autocov_method=AutocovMethod())
        assert_close(got, c["mcse_quantile_0.1"], "ar1 mcse quantile 0.1")
        got_m = mdt.mcse(_x(c), kind="mean", autocov_method=AutocovMethod())
        assert_close(got_m, c["mcse_mean"], "ar1 mcse mean")


def jnp_mean(v):
    import jax.numpy as jnp

    return jnp.mean(v)


class TestNestedGolden:
    @pytest.mark.parametrize("kind", ["rank", "bulk", "tail", "basic"])
    def test_kinds(self, gold, kind):
        c = gold["nested_500x8x6"]
        got = mdt.rhat_nested(_x(c), np.asarray(c["ids"]), kind=kind)
        assert_close(got, c[f"rhat_nested_{kind}"], f"nested {kind}")

    def test_basic_split1(self, gold):
        c = gold["nested_500x8x6"]
        got = mdt.rhat_nested(
            _x(c), np.asarray(c["ids"]), kind="basic", split_chains=1
        )
        assert_close(got, c["rhat_nested_basic_split1"], "nested basic split1")
