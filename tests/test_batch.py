"""Batched classical diagnostics == scalar versions applied per series."""

import numpy as np
import pytest

import ref_impl
import mcmcdiagnostictools_jl_tpu as mdt
from mcmcdiagnostictools_jl_tpu.diagnostics.batch import (
    gewekediag_batch,
    heideldiag_batch,
    rafterydiag_batch,
)


@pytest.fixture
def chains(rng):
    x = ref_impl.ar1_matrix(rng, 0.5, 1.0, (600, 3, 2))
    x[:150, 0, 0] += 3.0  # give one series a transient
    return x


class TestGewekeBatch:
    def test_matches_scalar(self, chains):
        res = gewekediag_batch(chains)
        assert res.zscore.shape == (3, 2)
        for c in range(3):
            for p in range(2):
                scalar = mdt.gewekediag(chains[:, c, p])
                np.testing.assert_allclose(res.zscore[c, p], scalar.zscore,
                                           rtol=1e-7)
                np.testing.assert_allclose(res.pvalue[c, p], scalar.pvalue,
                                           rtol=1e-6, atol=1e-12)


class TestHeidelBatch:
    def test_matches_scalar(self, chains):
        res = heideldiag_batch(chains)
        assert res.burnin.shape == (3, 2)
        for c in range(3):
            for p in range(2):
                scalar = mdt.heideldiag(chains[:, c, p])
                assert res.burnin[c, p] == scalar.burnin, (c, p)
                assert bool(res.stationarity[c, p]) == scalar.stationarity
                np.testing.assert_allclose(res.pvalue[c, p], scalar.pvalue,
                                           rtol=1e-4, atol=1e-8)
                np.testing.assert_allclose(res.mean[c, p], scalar.mean,
                                           rtol=1e-10)
                np.testing.assert_allclose(res.halfwidth[c, p], scalar.halfwidth,
                                           rtol=1e-5)
                assert bool(res.test[c, p]) == scalar.test


class TestRafteryBatch:
    def test_matches_scalar(self, rng):
        x = ref_impl.ar1_matrix(rng, 0.8, 1.0, (8000, 2, 2))
        res = rafterydiag_batch(x)
        assert res.thinning.shape == (2, 2)
        for c in range(2):
            for p in range(2):
                scalar = mdt.rafterydiag(x[:, c, p])
                assert res.thinning[c, p] == scalar.thinning
                np.testing.assert_allclose(res.total[c, p], scalar.total)


class TestExportedDispatch:
    """The PUBLIC names accept (draws, chains[, params...]) and dispatch to
    the batched kernels (VERDICT r4 ask 3) — one call, not C*P round trips —
    while 1-d input keeps the reference scalar path."""

    def test_gewekediag_nd(self, chains):
        res = mdt.gewekediag(chains)
        assert res.zscore.shape == (3, 2)
        scalar = mdt.gewekediag(chains[:, 1, 1])
        np.testing.assert_allclose(res.zscore[1, 1], scalar.zscore, rtol=1e-7)

    def test_heideldiag_nd(self, chains):
        res = mdt.heideldiag(chains)
        assert res.burnin.shape == (3, 2)
        scalar = mdt.heideldiag(chains[:, 0, 0])
        assert res.burnin[0, 0] == scalar.burnin
        assert bool(res.stationarity[0, 0]) == scalar.stationarity

    def test_rafterydiag_nd(self, rng):
        x = ref_impl.ar1_matrix(rng, 0.8, 1.0, (8000, 2, 2))
        res = mdt.rafterydiag(x)
        assert res.thinning.shape == (2, 2)
        scalar = mdt.rafterydiag(x[:, 1, 0])
        assert res.thinning[1, 0] == scalar.thinning
        np.testing.assert_allclose(res.total[1, 0], scalar.total)

    def test_2d_input(self, chains):
        res = mdt.gewekediag(chains[:, :, 0])
        assert res.zscore.shape == (3,)
        res = mdt.rafterydiag(chains[:, :, 0])
        assert res.thinning.shape == (3,)

    def test_kwargs_forwarded(self, chains):
        a = mdt.gewekediag(chains, first=0.2, last=0.4)
        s = mdt.gewekediag(chains[:, 2, 1], first=0.2, last=0.4)
        np.testing.assert_allclose(a.zscore[2, 1], s.zscore, rtol=1e-7)


class TestDynamicGeyer:
    def test_dynamic_matches_static_truncation(self, rng):
        """geyer_ess_from_rho_dynamic(rho, n, L) == static reduction on rho[:L+1]."""
        import jax.numpy as jnp
        from mcmcdiagnostictools_jl_tpu.ops.geyer import (
            geyer_ess_from_rho,
            geyer_ess_from_rho_dynamic,
        )

        # realistic decaying autocorrelation curves with sign noise
        lags = np.arange(251)[:, None]
        rho = 0.9 ** lags * np.cos(0.3 * lags * (1 + np.arange(6)[None, :]))
        rho[0] = 1.0
        rho = jnp.asarray(rho)
        for eff in (250, 249, 101, 37, 8, 5, 3, 2):
            static = geyer_ess_from_rho(rho[: eff + 1], 4000)
            dynamic = geyer_ess_from_rho_dynamic(rho, 4000, eff)
            np.testing.assert_allclose(
                np.asarray(dynamic), np.asarray(static), rtol=1e-12,
                err_msg=f"eff_maxlag={eff}",
            )

    def test_nan_pair_breaks_like_nonpositive(self):
        """ADVICE r4: a NaN lag pair BREAKS the reference walk (Δ > 0 is
        false) and is never summed — NaN must reach the result only through
        the always-summed lag-1 pair or through rho[k_final] when the
        breaking even lag itself is NaN."""
        import jax.numpy as jnp

        from mcmcdiagnostictools_jl_tpu.ops.geyer import (
            geyer_ess_from_rho,
            geyer_ess_from_rho_dynamic,
        )

        base = 0.8 ** np.arange(251)
        base[0] = 1.0

        # NaN at a lag PAST the natural break: result equals the clean curve
        broken = base.copy()
        broken[40:42] = -0.5  # pair (40, 41) breaks the walk
        late_nan = broken.copy()
        late_nan[200] = np.nan
        rho = jnp.asarray(np.stack([broken, late_nan], axis=1))
        out = np.asarray(geyer_ess_from_rho(rho, 4000))
        assert np.isfinite(out[1])
        np.testing.assert_allclose(out[1], out[0], rtol=1e-12)
        out_dyn = np.asarray(geyer_ess_from_rho_dynamic(rho, 4000, 250))
        np.testing.assert_allclose(out_dyn, out, rtol=1e-12)

        # NaN at the BREAKING pair: odd-lag NaN -> finite (rho[k_final] is
        # the even lag); even-lag NaN -> NaN via rho[k_final]
        odd_nan = base.copy()
        odd_nan[41] = np.nan
        even_nan = base.copy()
        even_nan[40] = np.nan
        all_nan = np.full(251, np.nan)
        rho = jnp.asarray(np.stack([odd_nan, even_nan, all_nan], axis=1))
        out = np.asarray(geyer_ess_from_rho(rho, 4000))
        assert np.isfinite(out[0])
        assert np.isnan(out[1])
        assert np.isnan(out[2])  # lag-1 pair NaN poisons sum_p

    def test_window_kernel_matches_full_series_mcse(self, rng):
        """A (0, n) window equals the plain single-chain mean-MCSE."""
        import mcmcdiagnostictools_jl_tpu as mdt
        from mcmcdiagnostictools_jl_tpu.diagnostics.batch import _window_mcse_mean

        x = ref_impl.ar1_matrix(rng, 0.6, 1.0, (800, 1, 3))[:, 0, :]
        s, m, _ = _window_mcse_mean(x, np.array([0]), np.array([800]))
        ref = np.asarray(mdt.mcse(x[:, None, :], split_chains=1))
        np.testing.assert_allclose(np.asarray(s[0]), ref, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(m[0]), x.mean(axis=0), rtol=1e-12)
