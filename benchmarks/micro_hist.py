"""Microbench: histogram/CDF rank-transform building blocks on TPU.

Compares candidate primitives for the f32 fast-mode rank transform at the
bench.py chunk shape (N = draws*chains = 1.28M rows, P = 64 params):

histogram (per-column counts over K bins):
  - scatter-add        ``zeros.at[bins, col].add(1)``
  - radix matmul       one-hot (N,Kc,P) x (N,Kf,P) -> (Kc,Kf,P) on the MXU

per-element table lookup (K,P) table at (N,P) integer bins:
  - take_along_axis    XLA gather
  - radix matmul       einsum('ikp,kfp->ifp') then row dot

reference points: one full payload sort (the op fast mode removes) and the
elementwise bin computation itself.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, reps=5):
    t0 = time.perf_counter()
    out = jax.tree.leaves(fn(*args))[0]
    np.asarray(out.ravel()[-1])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.tree.leaves(fn(*args))[0]
        np.asarray(out.ravel()[-1])
        ts.append(time.perf_counter() - t0)
    print(f"{label:42s} compile {compile_s:6.1f}s  run {sorted(ts)[len(ts)//2]*1e3:8.2f} ms",
          flush=True)
    return out


D, C, P = 10_000, 128, 64
N = D * C
rng = np.random.default_rng(0)
x = jax.device_put(rng.standard_normal((N, P)).astype(np.float32))


@jax.jit
def full_sort_pair(xf):
    iota = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0)
    return jax.lax.sort((xf, iota), dimension=0, num_keys=1, is_stable=False)


@partial(jax.jit, static_argnames=("k",))
def compute_bins(xf, k: int):
    lo = jnp.min(xf, axis=0)
    hi = jnp.max(xf, axis=0)
    scale = jnp.where(hi > lo, k / (hi - lo), 0.0)
    s = (xf - lo[None]) * scale[None]
    b = jnp.clip(s.astype(jnp.int32), 0, k - 1)
    return b, s - b.astype(jnp.float32)


@partial(jax.jit, static_argnames=("k",))
def hist_scatter(xf, k: int):
    b, _ = compute_bins(xf, k)
    cols = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    return jnp.zeros((k, xf.shape[1]), jnp.float32).at[b, cols].add(1.0)


@partial(jax.jit, static_argnames=("k", "kf", "chunk"))
def hist_radix(xf, k: int, kf: int = 64, chunk: int = 5000):
    kc = k // kf
    b, _ = compute_bins(xf, k)
    n, p = b.shape
    nchunks = n // chunk
    bc = b.reshape(nchunks, chunk, p)
    iota_c = jnp.arange(kc, dtype=jnp.int32)
    iota_f = jnp.arange(kf, dtype=jnp.int32)

    def body(acc, bi):
        c = bi // kf
        f = bi % kf
        a = (c[:, None, :] == iota_c[None, :, None]).astype(jnp.bfloat16)
        bb = (f[:, None, :] == iota_f[None, :, None]).astype(jnp.bfloat16)
        h = jnp.einsum("ikp,ifp->kfp", a, bb,
                       preferred_element_type=jnp.float32)
        return acc + h, None

    acc0 = jnp.zeros((kc, kf, p), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, bc)
    return acc.reshape(k, p)


@partial(jax.jit, static_argnames=("k",))
def lookup_take(xf, k: int):
    b, _ = compute_bins(xf, k)
    tab = jnp.cumsum(jnp.ones((k, xf.shape[1]), jnp.float32), axis=0)  # dummy
    return jnp.take_along_axis(tab, b, axis=0)


@partial(jax.jit, static_argnames=("k", "kf", "chunk"))
def lookup_radix(xf, k: int, kf: int = 64, chunk: int = 5000):
    kc = k // kf
    b, _ = compute_bins(xf, k)
    n, p = b.shape
    tab = jnp.cumsum(jnp.ones((k, p), jnp.float32), axis=0)
    t3 = tab.reshape(kc, kf, p)
    nchunks = n // chunk
    bc = b.reshape(nchunks, chunk, p)
    iota_c = jnp.arange(kc, dtype=jnp.int32)
    iota_f = jnp.arange(kf, dtype=jnp.int32)

    def body(_, bi):
        c = bi // kf
        f = bi % kf
        a = (c[:, None, :] == iota_c[None, :, None]).astype(jnp.bfloat16)
        rows = jnp.einsum("ikp,kfp->ifp", a, t3.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        bb = (f[:, None, :] == iota_f[None, :, None]).astype(jnp.float32)
        return None, jnp.sum(rows * bb, axis=1)

    _, out = jax.lax.scan(body, None, bc)
    return out.reshape(n, p)


if __name__ == "__main__":
    from mcmcdiagnostictools_jl_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    print(f"shape N={N} P={P}, device={jax.devices()[0]}")
    timeit("compute_bins k=4096", compute_bins, x, 4096)
    for k in (1024, 4096):
        timeit(f"hist radix   k={k}", hist_radix, x, k)
        timeit(f"lookup take_along_axis k={k}", lookup_take, x, k)
        timeit(f"lookup radix matmul    k={k}", lookup_radix, x, k)
    # correctness cross-check
    h1 = np.asarray(hist_scatter(x, 1024))  # noqa: slow but one-shot
    h2 = np.asarray(hist_radix(x, 1024))
    print("hist scatter==radix:", np.array_equal(h1, h2))
    l1 = np.asarray(lookup_take(x, 1024))
    l2 = np.asarray(lookup_radix(x, 1024))
    print("lookup take==radix:", np.array_equal(l1, l2))
