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
