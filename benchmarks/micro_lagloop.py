"""Microbench: lag-loop formulations for the fused direct-autocov kernel.

The fused basic kernel (ops/pallas/fused_basic_kernel.py) costs ~96 ms per
(5000, 256, 64) split block — ~4-5x above the VPU roofline for its
2*niter*maxlag*series FMA count. Hypothesis: the per-lag DYNAMIC unaligned
sublane slice (`scratch[pl.ds(k, niter)]`) forces a full-block relayout per
lag. Variants measured here:

A. baseline: dynamic slice per lag (current kernel's loop)
B. 8-lag groups: one 8-aligned dynamic slice per group + 8 STATIC inner
   shifts (relayout amortized 8x if static shifts lower to cheap rotates)
C. rolled accumulator: keep a shifted copy, advance with pltpu.roll per lag

Run on the TPU when idle: python benchmarks/micro_lagloop.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NITER, MAXLAG = 5000, 250
SERIES = 256 * 64  # one bench param-chunk after split


def _kernel_a(x_ref, acov_ref, scratch_ref, *, niter, maxlag):
    x = x_ref[:]
    scratch_ref[:niter, :] = x
    scratch_ref[pl.ds(niter, maxlag), :] = jnp.zeros((maxlag, LANES), x.dtype)

    def body(k, _):
        shifted = scratch_ref[pl.ds(k, niter), :]
        acov_ref[k, :] = jnp.sum(x * shifted, axis=0) / niter
        return 0

    jax.lax.fori_loop(0, maxlag + 1, body, 0)


def _kernel_b(x_ref, acov_ref, scratch_ref, *, niter, maxlag):
    x = x_ref[:]
    scratch_ref[:niter, :] = x
    pad = maxlag + 8
    scratch_ref[pl.ds(niter, pad), :] = jnp.zeros((pad, LANES), x.dtype)
    ngroups = (maxlag + 1 + 7) // 8

    def body(g, _):
        base = pl.multiple_of(g * 8, 8)
        y8 = scratch_ref[pl.ds(base, niter + 8), :]
        for d in range(8):
            k = g * 8 + d

            @pl.when(k <= maxlag)
            def _():
                acov_ref[k, :] = jnp.sum(x * y8[d:d + niter, :],
                                         axis=0) / niter
        return 0

    jax.lax.fori_loop(0, ngroups, body, 0)


def _run(kernel, label, x):
    niter = NITER
    fn = pl.pallas_call(
        functools.partial(kernel, niter=niter, maxlag=MAXLAG),
        grid=(SERIES // LANES,),
        in_specs=[pl.BlockSpec((niter, LANES), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((MAXLAG + 1, LANES), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((MAXLAG + 1, SERIES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((niter + MAXLAG + 8, LANES), jnp.float32)],
    )
    jf = jax.jit(fn)
    t0 = time.perf_counter()
    out = jf(x)
    np.asarray(out.ravel()[-1])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jf(x)
        np.asarray(out.ravel()[-1])
        ts.append(time.perf_counter() - t0)
    print(f"{label}: compile {compile_s:.1f}s run {sorted(ts)[2]*1e3:.1f} ms",
          flush=True)
    return out


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((NITER, SERIES)).astype(np.float32)
    )
    a = _run(_kernel_a, "A dynamic-slice per lag", x)
    b = _run(_kernel_b, "B 8-lag groups, static inner shifts", x)
    print("A == B:", np.allclose(np.asarray(a), np.asarray(b), atol=1e-5),
          flush=True)
