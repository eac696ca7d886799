"""Staged bitonic sort kernel vs numpy (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcmcdiagnostictools_jl_tpu.ops.pallas.sort_kernel import staged_sort


@pytest.mark.parametrize("n,p,tile", [
    (16, 1, 16),        # single tile, exact pow2
    (100, 5, 16),       # pad rows + lanes, multi-tile
    (1000, 2, 64),      # several merge levels
    (4096, 4, 256),     # pow2 rows, 16 tiles
])
def test_staged_sort_matches_numpy(rng, n, p, tile):
    x = rng.standard_normal((n, p)).astype(np.float32)
    x[rng.random((n, p)) < 0.2] = 0.5  # ties
    iota = np.broadcast_to(np.arange(n)[:, None], (n, p)).astype(np.int32).copy()
    ks, ps = staged_sort(jnp.asarray(x), jnp.asarray(iota), tile=tile,
                         interpret=True)
    ks, ps = np.asarray(ks), np.asarray(ps)
    np.testing.assert_array_equal(ks, np.sort(x, axis=0))
    for j in range(p):
        np.testing.assert_array_equal(x[ps[:, j], j], ks[:, j])


def test_all_equal_column(rng):
    x = np.full((128, 3), 2.5, dtype=np.float32)
    iota = np.broadcast_to(np.arange(128)[:, None], (128, 3)).astype(np.int32).copy()
    ks, ps = staged_sort(jnp.asarray(x), jnp.asarray(iota), tile=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(ks), x)
    # payload must be a permutation per column
    for j in range(3):
        assert sorted(np.asarray(ps)[:, j].tolist()) == list(range(128))
