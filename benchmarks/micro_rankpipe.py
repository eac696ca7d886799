"""Microbench: rank-kind pipeline stages on TPU, one 64-param chunk.

Isolates compile + run time of each stage of the new rank pipeline.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mcmcdiagnostictools_jl_tpu as mdt
from mcmcdiagnostictools_jl_tpu.diagnostics.ess_rhat import (
    _ess_rhat_pipeline,
    _tail_rhat_from_sort,
)
from mcmcdiagnostictools_jl_tpu.ops.ranknorm import (
    sort_with_positions,
    sorted_quantile,
)


@jax.jit
def _scalarize(x):
    return jnp.sum(x.ravel()[:8])


def _force(out):
    return float(_scalarize(jax.tree.leaves(out)[0]))


def timeit(label, fn, *args, reps=3):
    t0 = time.perf_counter()
    _force(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: compile {compile_s:.1f}s run {sorted(ts)[len(ts)//2]*1e3:.1f}ms", flush=True)


D, C, P = 10_000, 128, 64
rng = np.random.default_rng(0)
x = jax.device_put(rng.standard_normal((D, C, P)).astype(np.float32))


@jax.jit
def tail_rhat_only(x3):
    xs, order, bad = sort_with_positions(x3)
    med = jnp.where(bad, jnp.nan, sorted_quantile(xs, 0.5))
    return _tail_rhat_from_sort(xs, order, med, bad, x3.shape, 2, False)


def rank_pipe(x3):
    return _ess_rhat_pipeline(
        x3, kind="rank", split_chains=2, maxlag=250, method="fused",
        relative=False,
    )


if __name__ == "__main__":
    timeit("tail_rhat_only (sort+fold sort+hist)", tail_rhat_only, x)
    timeit("rank pipeline one chunk", rank_pipe, x)
