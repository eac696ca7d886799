"""Benchmark harness for the five BASELINE.json configurations.

Writes one JSON report with wall times and derived throughputs. Run on the
target chip (f32 fast mode):

    python benchmarks/suite.py [--out benchmarks/report.json]

Configs (BASELINE.md):
1. rank-normalized split-R-hat + bulk/tail ESS, 4 chains x 1000 draws iid
2. MCSE (mean/std/quantile) + BFMI on a stored 8-chain HMC 8-schools trace
3. full classical suite batched over 100 params x 8 chains x 10k draws
4. large batched ESS/R-hat: up to 1000 params x 128 chains x 10k draws
5. many-chain regime: nested R-hat + R* over 10k chains (single chip here;
   the cross-host variant runs via parallel.ess_rhat_sharded on a pod slice)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _force(out):
    """Force device completion with a tiny host readback.

    ``block_until_ready`` alone is not trustworthy through the axon tunnel
    for repeated identical dispatches (config 4 once measured 0.25 ms for a
    5 GB workload); reading one element back proves the result exists.
    """
    import jax
    import numpy as np

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ndim")]
    for leaf in leaves:
        np.asarray(leaf if leaf.ndim == 0 else leaf.ravel()[-1])
    return out


def _timed(fn, repeats: int = 3, fresh=None):
    """Median wall of ``repeats`` runs. ``fresh``: optional callable giving a
    NEW input per repeat (defeats any (executable, args) result caching)."""
    out = _force(fn() if fresh is None else fn(fresh()))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn() if fresh is None else fn(fresh())
        _force(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], out


def config1():
    import mcmcdiagnostictools_jl_tpu as mdt

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1000, 4)).astype(np.float32)
    dt, r = _timed(lambda: mdt.ess_rhat(x, kind="rank"))
    dt_tail, _ = _timed(lambda: mdt.ess(x, kind="tail"))
    return {
        "wall_s_rank": dt, "wall_s_tail_ess": dt_tail,
        "ess": float(np.asarray(r.ess)), "rhat": float(np.asarray(r.rhat)),
    }


def config2():
    import jax
    import mcmcdiagnostictools_jl_tpu as mdt
    from mcmcdiagnostictools_jl_tpu.models import eight_schools_logpdf, hmc_sample

    init = jax.random.normal(jax.random.PRNGKey(2), (8, 10)) * 0.5
    trace = hmc_sample(eight_schools_logpdf, init, jax.random.PRNGKey(3),
                       num_samples=1000, step_size=0.2, max_leapfrog=16)
    x = np.asarray(trace.samples, dtype=np.float32)
    energy = np.asarray(trace.energy, dtype=np.float32)
    dt_mean, _ = _timed(lambda: mdt.mcse(x))
    dt_std, _ = _timed(lambda: mdt.mcse(x, kind="std"))
    dt_q, _ = _timed(lambda: mdt.mcse(x, kind=mdt.Quantile(0.25)))
    dt_bfmi, b = _timed(lambda: mdt.bfmi(energy))
    return {
        "wall_s_mcse_mean": dt_mean, "wall_s_mcse_std": dt_std,
        "wall_s_mcse_quantile": dt_q, "wall_s_bfmi": dt_bfmi,
        "bfmi_min": float(np.min(np.asarray(b))),
    }


def config3():
    import mcmcdiagnostictools_jl_tpu as mdt
    from mcmcdiagnostictools_jl_tpu.diagnostics.batch import (
        gewekediag_batch, heideldiag_batch, rafterydiag_batch,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((10_000, 8, 100)).astype(np.float32)
    out = {}
    t0 = time.perf_counter()
    gewekediag_batch(x)
    out["wall_s_geweke_batch_cold"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    gewekediag_batch(x)
    out["wall_s_geweke_batch"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    heideldiag_batch(x)
    out["wall_s_heidel_batch_cold"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    heideldiag_batch(x)
    out["wall_s_heidel_batch"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    rafterydiag_batch(x)  # vectorized host path, all 800 series
    out["wall_s_raftery_800series"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    from mcmcdiagnostictools_jl_tpu.diagnostics.discretediag import discretediag
    xd = np.digitize(x[:, :, :20], [-1.0, 0.0, 1.0])  # 4-category codes
    discretediag(xd, nsim=200)
    out["wall_s_discretediag_20params"] = time.perf_counter() - t0
    dt, _ = _timed(lambda: mdt.gelmandiag(x))
    out["wall_s_gelman"] = dt
    return out


def config4():
    import jax
    import mcmcdiagnostictools_jl_tpu as mdt

    rng = np.random.default_rng(0)
    results = {}
    for params in (1000, 512, 256):
        try:
            xs = [
                jax.device_put(
                    rng.standard_normal((10_000, 128, params)).astype(
                        np.float32
                    )
                )
                for _ in range(2)
            ]
            it = iter(xs * 2)
            dt, _ = _timed(
                lambda x: mdt.ess_rhat(x, kind="rank", param_chunk=64),
                repeats=2, fresh=lambda: next(it),
            )
            results["params"] = params
            results["wall_s_rank"] = dt
            results["param_draws_per_s"] = 10_000 * params / dt
            break
        except Exception as e:  # noqa: BLE001 - OOM ladder
            results[f"skipped_{params}"] = str(e)[:120]
    return results


def config5():
    import mcmcdiagnostictools_jl_tpu as mdt
    from mcmcdiagnostictools_jl_tpu.models import GBTClassifier

    rng = np.random.default_rng(0)
    nchains, ndraws, nparams = 10_000, 100, 4
    x = rng.standard_normal((ndraws, nchains, nparams)).astype(np.float32)
    ids = np.repeat(np.arange(100), 100)  # 100 superchains x 100 chains
    dt_nested, r = _timed(lambda: mdt.rhat_nested(x, ids))
    t0 = time.perf_counter()
    # full-scale R*: 1e4 chains -> 2e4 split-chain classes through the
    # class-chunked streaming GBT (models/gbt.py, never materializes the
    # (n, K) logit matrix)
    dist = mdt.rstar(
        GBTClassifier(n_rounds=20, n_bins=32, class_chunk=256), x, rng=0
    )
    dt_rstar = time.perf_counter() - t0
    return {
        "wall_s_nested_rhat_10k_chains": dt_nested,
        "nested_rhat_max": float(np.max(np.asarray(r))),
        "wall_s_rstar_10k_chains_incl_compile": dt_rstar,
        "rstar_mean": float(dist.mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/report.json")
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()

    import jax

    report = {"device": str(jax.devices()[0]), "configs": {}}
    fns = {"1": config1, "2": config2, "3": config3, "4": config4, "5": config5}
    for key in args.configs.split(","):
        t0 = time.perf_counter()
        try:
            report["configs"][key] = fns[key]()
        except Exception as e:  # noqa: BLE001
            report["configs"][key] = {"error": repr(e)[:300]}
        report["configs"][key]["total_s_incl_compile"] = time.perf_counter() - t0
        print(f"config {key}: {json.dumps(report['configs'][key])}", flush=True)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
