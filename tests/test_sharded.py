"""Sharded == single-device parity on a virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

import mcmcdiagnostictools_jl_tpu as mdt
from mcmcdiagnostictools_jl_tpu.parallel import make_mesh, ess_rhat_sharded

cpu_devices = jax.local_devices(backend="cpu")
needs8 = pytest.mark.skipif(len(cpu_devices) < 8, reason="needs 8 virtual devices")


def _mesh(chain_shards, param_shards):
    return make_mesh(chain_shards, param_shards,
                     devices=cpu_devices[: chain_shards * param_shards])


@needs8
class TestShardedParity:
    @pytest.mark.parametrize("kind", ["basic", "bulk", "tail", "rank"])
    @pytest.mark.parametrize("layout", [(8, 1), (4, 2), (2, 4), (1, 8)])
    def test_matches_single_device(self, rng, kind, layout):
        x = rng.standard_normal((300, 8, 8))
        got = ess_rhat_sharded(x, _mesh(*layout), kind=kind)
        want = mdt.ess_rhat(x, kind=kind)
        np.testing.assert_allclose(np.asarray(got.ess), np.asarray(want.ess),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(got.rhat), np.asarray(want.rhat),
                                   rtol=1e-10)

    def test_single_device_mesh_is_special_case(self, rng):
        x = rng.standard_normal((200, 4, 4))
        got = ess_rhat_sharded(x, _mesh(1, 1), kind="rank")
        want = mdt.ess_rhat(x, kind="rank")
        np.testing.assert_allclose(np.asarray(got.ess), np.asarray(want.ess),
                                   rtol=1e-12)

    def test_degenerate_nan_through_collectives(self):
        x = np.full((96, 8, 2), 1.25)
        got = ess_rhat_sharded(x, _mesh(8, 1), kind="basic")
        assert np.all(np.isnan(np.asarray(got.ess)))
        assert np.all(np.isnan(np.asarray(got.rhat)))

    def test_autocov_methods(self, rng):
        x = rng.standard_normal((300, 8, 4))
        for m in ("fft", "direct", "bda"):
            got = ess_rhat_sharded(x, _mesh(4, 2), kind="basic", autocov_method=m)
            want = mdt.ess_rhat(x, kind="basic", autocov_method=m)
            np.testing.assert_allclose(np.asarray(got.ess), np.asarray(want.ess),
                                       rtol=1e-9)

    def test_split_chains_discard_rule(self, rng):
        x = rng.standard_normal((301, 8, 4))  # odd draws exercise the discard
        got = ess_rhat_sharded(x, _mesh(8, 1), kind="basic", split_chains=3)
        want = mdt.ess_rhat(x, kind="basic", split_chains=3)
        np.testing.assert_allclose(np.asarray(got.ess), np.asarray(want.ess),
                                   rtol=1e-10)


@needs8
class TestNestedSharded:
    @pytest.mark.parametrize("kind", ["basic", "bulk", "tail", "rank"])
    def test_matches_single_device(self, rng, kind):
        from mcmcdiagnostictools_jl_tpu.parallel import rhat_nested_sharded

        x = rng.standard_normal((100, 16, 4))
        ids = np.repeat(np.arange(8), 2)  # 8 superchains x 2 chains
        got = rhat_nested_sharded(x, ids, _mesh(4, 2), kind=kind)
        want = mdt.rhat_nested(x, ids, kind=kind)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)

    def test_uneven_superchains_rejected(self, rng):
        from mcmcdiagnostictools_jl_tpu.parallel import rhat_nested_sharded

        x = rng.standard_normal((100, 6, 2))
        ids = np.repeat(np.arange(3), 2)  # 3 superchains over 2 shards
        with pytest.raises(ValueError):
            rhat_nested_sharded(x, ids, _mesh(2, 1))
