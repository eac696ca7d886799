"""Sampler-in-the-loop integration tests (replaces the reference's DynamicHMC
NUTS test, test/ess_rhat.jl:377-399, per SURVEY.md section 4)."""

import jax
import numpy as np
import pytest

import mcmcdiagnostictools_jl_tpu as mdt
from mcmcdiagnostictools_jl_tpu.models import (
    cauchy_logpdf,
    eight_schools_logpdf,
    hmc_sample,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cauchy_trace():
    init = jax.random.normal(jax.random.PRNGKey(1), (4, 50)) * 0.5
    return hmc_sample(
        cauchy_logpdf, init, jax.random.PRNGKey(0),
        num_samples=1000, step_size=0.25, max_leapfrog=16,
    )


@pytest.fixture(scope="module")
def schools_trace():
    init = jax.random.normal(jax.random.PRNGKey(2), (8, 10)) * 0.5
    return hmc_sample(
        eight_schools_logpdf, init, jax.random.PRNGKey(3),
        num_samples=1000, step_size=0.2, max_leapfrog=16,
    )


class TestCauchyHeavyTails:
    def test_sampler_healthy(self, cauchy_trace):
        acc = np.asarray(cauchy_trace.accept_rate)
        assert np.all(acc > 0.6)

    def test_bulk_ok_tail_poor(self, cauchy_trace):
        # heavy tails: tail-ESS must lag bulk-ESS (the reference's Cauchy
        # integration-test assertion)
        x = np.asarray(cauchy_trace.samples)
        bulk = np.asarray(mdt.ess(x, kind="bulk"))
        tail = np.asarray(mdt.ess(x, kind="tail"))
        assert np.median(tail) < 0.8 * np.median(bulk)
        assert np.median(bulk) > 50

    def test_bfmi_flags_heavy_tails(self, cauchy_trace):
        # Cauchy energies mix badly: BFMI low (near the 0.3 alert level)
        b = np.asarray(mdt.bfmi(np.asarray(cauchy_trace.energy)))
        assert np.all(b < 1.0)


class TestEightSchools:
    def test_converged(self, schools_trace):
        x = np.asarray(schools_trace.samples)
        r = mdt.ess_rhat(x)
        assert np.all(np.asarray(r.rhat) < 1.05)
        assert np.all(np.asarray(r.ess) > 100)

    def test_mcse_sane(self, schools_trace):
        x = np.asarray(schools_trace.samples)
        se = np.asarray(mdt.mcse(x))
        post_sd = x.reshape(-1, 10).std(axis=0)
        assert np.all(se > 0)
        assert np.all(se < post_sd)  # mcse well below posterior sd

    def test_rstar_near_one(self, schools_trace):
        from mcmcdiagnostictools_jl_tpu.models import GBTClassifier

        x = np.asarray(schools_trace.samples)
        dist = mdt.rstar(GBTClassifier(n_rounds=30, n_bins=32), x, rng=0)
        assert dist.mean() < 2.0
