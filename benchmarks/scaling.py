"""Weak-scaling harness: work-scaled throughput over 1..N virtual devices.

The BASELINE metric is "diagnostic throughput ...; scaling efficiency 1 -> N
hosts". Real multi-chip hardware is not reachable from this environment (one
v5e chip over a tunnel), so this harness measures the next-best observable:
the sharded pipelines on an N-virtual-device CPU mesh
(``--xla_force_host_platform_device_count``), **work-scaled** — every device
keeps the same (draws, chains_local, params) block while the total chain
count grows with N.

Interpretation on this box: all virtual devices share the host's physical
cores (2 here), so total compute grows ~linearly with N while the silicon
does not — the compute-serialized ideal wall is ``N * T1``. The collective /
orchestration overhead of the sharded formulation is therefore

    overhead(N) = T_N / (N * T_1)        (1.0 = free collectives)

and the number a real pod would care about — per-device work + collective
cost staying flat as chains scale — is what ``overhead`` tracks. Run:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py [--out benchmarks/scaling_r3.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def _timed(fn, repeats=3):
    import jax

    out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/scaling_r3.json")
    ap.add_argument("--draws", type=int, default=5000)
    ap.add_argument("--chains-per-dev", type=int, default=8)
    ap.add_argument("--params", type=int, default=16)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_default_device", jax.local_devices(backend="cpu")[0]
    )
    from mcmcdiagnostictools_jl_tpu.parallel import (
        ess_rhat_sharded,
        make_mesh,
        rhat_nested_sharded,
    )

    cpu = jax.local_devices(backend="cpu")
    d, c_loc, p = args.draws, args.chains_per_dev, args.params
    rng = np.random.default_rng(0)
    report = {
        "host_cores": os.cpu_count(),
        "virtual_devices": len(cpu),
        "per_device_block": [d, c_loc, p],
        "mode": "weak scaling (chains grow with devices)",
        "runs": {},
    }

    scales = [k for k in (1, 2, 4, 8) if k <= len(cpu)]
    for name, impls in (("ess_rhat_rank", ("gather", "ring")),
                        ("rhat_nested_rank", ("gather", "ring"))):
        for impl in impls:
            walls = {}
            for k in scales:
                chains = k * c_loc
                x = rng.standard_normal((d, chains, p)).astype(np.float32)
                cfg = make_mesh(k, 1, devices=cpu[:k])
                if name == "ess_rhat_rank":
                    fn = lambda: ess_rhat_sharded(
                        x, cfg, kind="rank", rank_impl=impl
                    )
                else:
                    ids = np.repeat(np.arange(2 * k), c_loc // 2)
                    fn = lambda: rhat_nested_sharded(
                        x, ids, cfg, kind="rank", rank_impl=impl
                    )
                walls[k] = _timed(fn)
                print(f"{name}/{impl} N={k}: {walls[k]:.3f}s", flush=True)
            t1 = walls[scales[0]]
            report["runs"][f"{name}_{impl}"] = {
                "wall_s": walls,
                "overhead_vs_serialized_ideal": {
                    k: walls[k] / (k * t1) for k in scales
                },
                "total_chain_draw_params_per_s": {
                    k: d * (k * c_loc) * p / walls[k] for k in scales
                },
            }

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2, default=str)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
