"""BFMI golden-value and shape tests (mirrors reference test/bfmi.jl)."""

import numpy as np
import pytest

import mcmcdiagnostictools_jl_tpu as mdt

# energy trace from sampling a 10-dim Cauchy; golden value 0.2406937229 was
# cross-checked against Python's arviz.bfmi by the reference (test/bfmi.jl:8-37)
ENERGY = np.array(
    [42, 44, 45, 46, 42, 43, 36, 36, 31, 36, 36, 32, 36, 31, 31, 29, 29,
     30, 25, 26, 29, 29, 27, 30, 31, 29], dtype=float,
)


class TestBfmi:
    def test_hand_computed(self):
        # bfmi([1,2,3,4]) = mean(diff^2)/var = 1 / (5/3) = 0.6
        assert mdt.bfmi([1, 2, 3, 4]) == pytest.approx(0.6, rel=1e-12)

    def test_arviz_golden(self):
        assert mdt.bfmi(ENERGY) == pytest.approx(0.2406937229, rel=1e-9)

    def test_multichain(self):
        e = np.tile(ENERGY[:, None], (1, 4))
        out = np.asarray(mdt.bfmi(e))
        np.testing.assert_allclose(out, np.full(4, 0.2406937229), rtol=1e-9)

    def test_dims_kw(self):
        e = np.tile(ENERGY[:, None], (1, 4))
        np.testing.assert_allclose(
            np.asarray(mdt.bfmi(e.T, dims=1)), np.asarray(mdt.bfmi(e)), rtol=1e-12
        )

    def test_low_bfmi_flags_poor_mixing(self, rng):
        # slowly-drifting energies -> small diffs relative to variance
        e = np.cumsum(rng.standard_normal(1000) * 0.1) + rng.standard_normal(1000) * 0.01
        assert mdt.bfmi(e) < 0.3

    def test_errors(self, rng):
        with pytest.raises(ValueError):
            mdt.bfmi(np.zeros((2, 2, 2)))
        with pytest.raises(ValueError):
            mdt.bfmi(np.zeros((4, 2)), dims=2)
