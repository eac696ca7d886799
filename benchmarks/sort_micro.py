"""Sort microbenchmark: XLA lax.sort vs the staged Pallas bitonic sort.

Run on the TPU (one process at a time — the axon tunnel is single-client):

    python benchmarks/sort_micro.py [rows] [lanes ...]

Times an (N, P) f32 key + i32 payload unstable sort — the exact op pair the
rank transform issues twice per rank-normalize.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[1]


def main():
    import jax
    import jax.numpy as jnp

    from mcmcdiagnostictools_jl_tpu.ops.pallas.sort_kernel import staged_sort

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_280_000
    lane_list = [int(a) for a in sys.argv[2:]] or [64, 128]

    rng = np.random.default_rng(0)
    for p in lane_list:
        x = jnp.asarray(rng.standard_normal((rows, p)).astype(np.float32))
        iota = jnp.broadcast_to(
            jnp.arange(rows, dtype=jnp.int32)[:, None], (rows, p)
        )

        xla = jax.jit(
            lambda k, v: jax.lax.sort((k, v), dimension=0, is_stable=False)
        )
        t_xla = _time(xla, x, iota)

        pallas = jax.jit(lambda k, v: staged_sort(k, v))
        try:
            t_pal = _time(pallas, x, iota)
            # correctness spot check
            ks, ps = pallas(x, iota)
            ks = np.asarray(ks[:, 0])
            ok = bool((np.diff(ks) >= 0).all())
        except Exception as e:  # noqa: BLE001
            t_pal, ok = float("nan"), repr(e)[:100]
        print(
            f"rows={rows} lanes={p}: xla={t_xla*1e3:.1f}ms "
            f"staged={t_pal*1e3:.1f}ms ratio={t_xla/t_pal:.2f} sorted_ok={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
