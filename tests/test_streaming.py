"""Streaming/out-of-core executor: chunked == monolithic, sources, stats.

The executor (mcmcdiagnostictools_jl_tpu/streaming.py) exists for the
north-star workload whose array exceeds device memory; correctness here is
"chunking is invisible": per-parameter independence makes every chunked
result identical to the monolithic call on the same data.
"""

import numpy as np
import pytest

import mcmcdiagnostictools_jl_tpu as mdt
from mcmcdiagnostictools_jl_tpu.streaming import stream_param_chunks


class TestESSRhatStreaming:
    @pytest.mark.parametrize("rank_mode", ["fast", "exact"])
    def test_matches_monolithic(self, rng, rank_mode):
        x = rng.standard_normal((600, 4, 37)).astype(np.float32)
        a = mdt.ess_rhat(x, kind="rank", rank_mode=rank_mode)
        b = mdt.ess_rhat_streaming(x, param_chunk=8, kind="rank",
                                   rank_mode=rank_mode)
        # chunk width changes XLA's f32 reduction tiling: ~2 ULP, not bitwise
        np.testing.assert_allclose(np.asarray(b.ess), np.asarray(a.ess),
                                   rtol=5e-6)
        np.testing.assert_allclose(np.asarray(b.rhat), np.asarray(a.rhat),
                                   rtol=5e-6)

    def test_ragged_final_chunk(self, rng):
        # 37 params / chunk 16 -> chunks 16, 16, 5 (zero-padded)
        x = rng.standard_normal((400, 4, 37)).astype(np.float32)
        b = mdt.ess_rhat_streaming(x, param_chunk=16)
        assert np.asarray(b.ess).shape == (37,)
        assert np.all(np.isfinite(np.asarray(b.ess)))

    def test_exactly_one_chunk(self, rng):
        x = rng.standard_normal((400, 4, 6)).astype(np.float32)
        a = mdt.ess_rhat(x, kind="rank", rank_mode="fast")
        b = mdt.ess_rhat_streaming(x, param_chunk=6)
        np.testing.assert_allclose(np.asarray(b.ess), np.asarray(a.ess),
                                   rtol=1e-6)

    def test_callable_source_never_materializes(self, rng):
        """The full array never needs to exist anywhere: the source
        generates each chunk on demand (deterministically per start)."""
        d, c, p = 500, 4, 24

        def source(start, size):
            cols = []
            for j in range(start, start + size):
                r = np.random.default_rng(1000 + j)
                cols.append(r.standard_normal((d, c)))
            return np.stack(cols, axis=2).astype(np.float32)

        b = mdt.ess_rhat_streaming(source, nparams=p, param_chunk=7)
        a = mdt.ess_rhat(source(0, p), kind="rank", rank_mode="fast")
        np.testing.assert_allclose(np.asarray(b.ess), np.asarray(a.ess),
                                   rtol=1e-6)

    def test_stats_shape(self, rng):
        x = rng.standard_normal((400, 4, 20)).astype(np.float32)
        r, stats = mdt.ess_rhat_streaming(x, param_chunk=8,
                                          return_stats=True)
        assert stats.n_chunks == 3
        assert len(stats.fetch_s) == 3 and len(stats.wait_s) == 3
        assert stats.wall_s > 0

    def test_param_shape_preserved(self, rng):
        """ess_rhat's output contract holds: trailing param shape kept,
        scalar for 2-d input (code-review r5 finding)."""
        x = rng.standard_normal((400, 4, 3, 5)).astype(np.float32)
        a = mdt.ess_rhat(x, kind="rank", rank_mode="fast")
        b = mdt.ess_rhat_streaming(x, param_chunk=4)
        assert np.asarray(b.ess).shape == (3, 5)
        np.testing.assert_allclose(np.asarray(b.ess), np.asarray(a.ess),
                                   rtol=5e-6)
        x2 = rng.standard_normal((400, 4)).astype(np.float32)
        s = mdt.ess_rhat_streaming(x2)
        assert np.ndim(s.ess) == 0 and np.ndim(s.rhat) == 0

    def test_rank_impl_requires_mesh(self, rng):
        x = rng.standard_normal((400, 4, 3)).astype(np.float32)
        with pytest.raises(ValueError, match="mesh_cfg"):
            mdt.ess_rhat_streaming(x, rank_impl="hist")

    def test_unsupported_kind_raises(self, rng):
        x = rng.standard_normal((400, 4, 3)).astype(np.float32)
        with pytest.raises(ValueError, match="kind"):
            mdt.ess_rhat_streaming(x, kind="quantile")

    def test_zero_params_raises(self, rng):
        x = rng.standard_normal((400, 4, 0)).astype(np.float32)
        with pytest.raises(ValueError, match="at least one parameter"):
            mdt.ess_rhat_streaming(x)

    def test_array_source_is_not_read_for_probing(self, rng):
        """Array/memmap sources: shape comes from .shape; no column read
        happens before streaming starts (review finding — a probe read is
        a wasted remote fetch for disk-backed sources)."""
        reads = []

        def counting_source(start, size):
            reads.append((start, size))
            r = np.random.default_rng(123)
            return r.standard_normal((300, 4, size)).astype(np.float32)

        mdt.ess_rhat_streaming(counting_source, nparams=6, param_chunk=6)
        # callable: exactly one (0, 1) discovery read + the chunk reads
        assert reads[0] == (0, 1) and reads[1:] == [(0, 6)], reads

    def test_nan_poisoning_streams(self, rng):
        x = rng.standard_normal((400, 4, 10)).astype(np.float32)
        x[3, 1, 4] = np.nan
        b = mdt.ess_rhat_streaming(x, param_chunk=4)
        ess = np.asarray(b.ess)
        assert np.isnan(ess[4]) and np.all(np.isfinite(np.delete(ess, 4)))

    def test_short_chain_raises(self, rng):
        with pytest.raises(ValueError, match="streaming"):
            mdt.ess_rhat_streaming(
                rng.standard_normal((8, 4, 3)).astype(np.float32)
            )

    def test_memmap_source(self, rng, tmp_path):
        """np.memmap input: genuine out-of-host-RAM streaming path."""
        x = rng.standard_normal((400, 4, 12)).astype(np.float32)
        f = tmp_path / "chains.dat"
        m = np.memmap(f, dtype=np.float32, mode="w+", shape=x.shape)
        m[:] = x
        m.flush()
        ro = np.memmap(f, dtype=np.float32, mode="r", shape=x.shape)
        a = mdt.ess_rhat(x, kind="rank", rank_mode="fast")
        b = mdt.ess_rhat_streaming(ro, param_chunk=5)
        np.testing.assert_allclose(np.asarray(b.ess), np.asarray(a.ess),
                                   rtol=1e-6)


class TestMeshStreaming:
    """Streaming onto a device mesh: chains sharded across devices while
    parameters stream through — the north-star execution model."""

    def test_matches_sharded_and_fast(self, rng):
        import jax

        from mcmcdiagnostictools_jl_tpu.parallel import (
            ess_rhat_sharded,
            make_mesh,
        )

        devices = jax.local_devices(backend="cpu")[:8]
        cfg = make_mesh(4, 2, devices=devices)
        x = rng.standard_normal((800, 8, 20)).astype(np.float32)
        a = ess_rhat_sharded(x, cfg, kind="rank", rank_impl="hist")
        b = mdt.ess_rhat_streaming(x, param_chunk=4, mesh_cfg=cfg,
                                   rank_impl="hist")
        np.testing.assert_allclose(np.asarray(b.ess), np.asarray(a.ess),
                                   rtol=5e-6)
        np.testing.assert_allclose(np.asarray(b.rhat), np.asarray(a.rhat),
                                   rtol=5e-6)
        # and against the single-device fast mode (hist == fast semantics)
        c = mdt.ess_rhat(x, kind="rank", rank_mode="fast")
        np.testing.assert_allclose(np.asarray(b.ess), np.asarray(c.ess),
                                   rtol=1e-5)

    def test_ragged_chunk_on_mesh(self, rng):
        import jax

        from mcmcdiagnostictools_jl_tpu.parallel import make_mesh

        devices = jax.local_devices(backend="cpu")[:8]
        cfg = make_mesh(4, 2, devices=devices)
        # 18 params, chunk 8 -> last chunk 2 params zero-padded to 8
        x = rng.standard_normal((600, 4, 18)).astype(np.float32)
        b = mdt.ess_rhat_streaming(x, param_chunk=8, mesh_cfg=cfg)
        assert np.asarray(b.ess).shape == (18,)
        assert np.all(np.isfinite(np.asarray(b.ess)))

    def test_bad_rank_impl_raises(self, rng):
        from mcmcdiagnostictools_jl_tpu.parallel import make_mesh
        import jax

        cfg = make_mesh(4, 2, devices=jax.local_devices(backend="cpu")[:8])
        x = rng.standard_normal((100, 4, 8)).astype(np.float32)
        with pytest.raises(ValueError, match="rank_impl"):
            mdt.ess_rhat_streaming(x, mesh_cfg=cfg, rank_impl="auto")
        # rank_mode and rank_impl must agree: exact + hist is a silent
        # approximation trap (code-review r5 finding)
        with pytest.raises(ValueError, match="conflicts"):
            mdt.ess_rhat_streaming(x, mesh_cfg=cfg, rank_mode="exact",
                                   rank_impl="hist")
        with pytest.raises(ValueError, match="conflicts"):
            mdt.ess_rhat_streaming(x, mesh_cfg=cfg, rank_mode="fast",
                                   rank_impl="gather")

    def test_exact_mode_on_mesh_defaults_to_gather(self, rng):
        import jax

        from mcmcdiagnostictools_jl_tpu.parallel import (
            ess_rhat_sharded,
            make_mesh,
        )

        cfg = make_mesh(4, 2, devices=jax.local_devices(backend="cpu")[:8])
        x = rng.standard_normal((600, 8, 8)).astype(np.float32)
        a = ess_rhat_sharded(x, cfg, kind="rank", rank_impl="gather")
        b = mdt.ess_rhat_streaming(x, param_chunk=4, mesh_cfg=cfg,
                                   rank_mode="exact")
        np.testing.assert_allclose(np.asarray(b.ess), np.asarray(a.ess),
                                   rtol=5e-6)


class TestGenericExecutor:
    def test_arbitrary_pipeline(self, rng):
        """Any per-param pipeline streams — here a mean/std pytree."""
        import jax
        import jax.numpy as jnp

        x = rng.standard_normal((300, 2, 21))

        @jax.jit
        def fn(chunk):
            return {"mean": jnp.mean(chunk, axis=(0, 1)),
                    "std": jnp.std(chunk, axis=(0, 1))}

        out = stream_param_chunks(fn, x, param_chunk=6)
        np.testing.assert_allclose(out["mean"], x.mean(axis=(0, 1)),
                                   rtol=1e-12)
        np.testing.assert_allclose(out["std"], x.std(axis=(0, 1)),
                                   rtol=1e-12)

    def test_bad_source_shape_raises(self, rng):
        def bad(start, size):
            return np.zeros((100, 2, size + 1))

        with pytest.raises(ValueError, match="source returned"):
            stream_param_chunks(lambda c: c.sum(axis=(0, 1)), bad,
                                nparams=10, param_chunk=5)

    def test_nparams_required_for_callable(self):
        with pytest.raises(ValueError, match="nparams"):
            stream_param_chunks(lambda c: c, lambda s, n: None)
