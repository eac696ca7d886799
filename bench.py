"""Benchmark: rank-kind ESS + R-hat throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- Workload: BASELINE.md config 4 scaled to a single chip — 10k draws x 128
  chains x P params, f32, kind="rank". Headline = rank_mode="fast" (the
  histogram/CDF fast mode, ops/fastrank.py + the fused Pallas kernels:
  sort-free, error bound documented and tested); wall_s_exact records the
  bit-parity exact-sort mode on the same inputs for continuity with rounds
  1-3 (whose headline was exact mode).
- value: parameter-draws per second (params * draws / wall_s), median of 3
  timed runs after a warmup/compile run.
- vs_baseline: ratio against a single-core NumPy/SciPy float64 implementation
  of the same rank-kind pipeline (tests/ref_impl.py), whose per-element
  throughput is measured on a small config and scaled — the only available
  reference point, since the upstream library publishes no numbers
  (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DRAWS = 10_000
CHAINS = 128
PARAMS_CANDIDATES = (256, 128, 64)
BASELINE_DRAWS, BASELINE_CHAINS, BASELINE_PARAMS = 2_000, 8, 4


def _baseline_throughput() -> float:
    """Single-core NumPy f64 rank-kind ESS+R-hat throughput (param-draws/s).

    Cached in baseline_cache.json so vs_baseline is stable across rounds
    (host load would otherwise jitter the denominator); delete the file to
    re-measure.
    """
    root = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(root, "baseline_cache.json")
    if os.path.exists(cache):
        with open(cache) as fh:
            return json.load(fh)["numpy_rank_param_draws_per_s"]
    sys.path.insert(0, os.path.join(root, "tests"))
    import ref_impl

    rng = np.random.default_rng(0)
    x = rng.standard_normal((BASELINE_DRAWS, BASELINE_CHAINS, BASELINE_PARAMS))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ref_impl.ess_rhat(x, kind="rank")
        times.append(time.perf_counter() - t0)
    value = BASELINE_DRAWS * BASELINE_PARAMS / sorted(times)[1]
    with open(cache, "w") as fh:
        json.dump({"numpy_rank_param_draws_per_s": value}, fh)
    return value


def main() -> None:
    import jax
    import mcmcdiagnostictools_jl_tpu as mdt
    from mcmcdiagnostictools_jl_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    last_err = None
    for params in PARAMS_CANDIDATES:
        try:
            # three DISTINCT input buffers: the axon tunnel can serve repeat
            # dispatches of an identical (executable, args) pair without
            # re-executing, and block_until_ready alone does not prove device
            # work happened (a suite run measured 0.25 ms for a 5 GB
            # workload) — distinct inputs + a host readback do.
            xs = [
                jax.device_put(
                    rng.standard_normal((DRAWS, CHAINS, params)).astype(
                        np.float32
                    )
                )
                for _ in range(3)
            ]
            # param_chunk bounds peak HBM so large workloads don't thrash;
            # 64-param chunks saturate the chip in exact mode (fast mode is
            # sort-free and runs unchunked)
            chunk = 64 if params > 64 else None

            def run_mode(**kw):
                r = mdt.ess_rhat(xs[0], kind="rank", **kw)  # compile+warmup
                np.asarray(r.ess)
                times = []
                for x in xs:
                    t0 = time.perf_counter()
                    r = mdt.ess_rhat(x, kind="rank", **kw)
                    np.asarray(r.ess[-1])  # tiny readback forces completion
                    times.append(time.perf_counter() - t0)
                return sorted(times)[1]

            dt_fast = run_mode(rank_mode="fast")
            dt_exact = run_mode(param_chunk=chunk)
            value = DRAWS * params / dt_fast
            baseline = _baseline_throughput()
            print(
                json.dumps(
                    {
                        "metric": "ess_rhat_rank_throughput_1chip",
                        "value": round(value, 1),
                        "unit": "param-draws/s",
                        "vs_baseline": round(value / baseline, 2),
                        "config": f"{DRAWS}x{CHAINS}x{params} f32",
                        "mode": "fast(hist)",
                        "wall_s": round(dt_fast, 4),
                        "wall_s_exact": round(dt_exact, 4),
                        "param_draws_per_s_exact": round(
                            DRAWS * params / dt_exact, 1
                        ),
                    }
                )
            )
            return
        except Exception as e:  # OOM on large configs -> try smaller
            last_err = e
            continue
    raise SystemExit(f"bench failed for all configs: {last_err}")


if __name__ == "__main__":
    main()
