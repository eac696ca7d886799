"""Microbenchmarks for the merge-scheduled Pallas sort design.

Measures, on the real chip:
  1. XLA lax.sort reference at (N, 128) f32 keys + i32 payload.
  2. Manual-DMA passthrough pass: pods of K tiles HBM->VMEM->HBM (traffic
     floor for one merge pass).
  3. Phase-A pod sort: full bitonic sort of a POD_ROWS x 128 block in VMEM
     (compute cost of the local phase).

Run: python benchmarks/sort_microbench.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE = 2048


def _sync(out):
    # axon tunnel: block_until_ready does not wait; force a host readback
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0][:1, :1])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


# ---------------------------------------------------------------- 1. XLA sort
def bench_xla_sort(n, lanes=LANES):
    k = jax.device_put(np.random.rand(n, lanes).astype(np.float32))
    p = jax.device_put(np.arange(n * lanes, dtype=np.int32).reshape(n, lanes))
    f = jax.jit(
        lambda k, p: jax.lax.sort((k, p), dimension=0, num_keys=1, is_stable=False)
    )
    dt = timeit(f, k, p)
    gb = n * lanes * 8 / 1e9
    print(f"xla_sort    (N={n}, L={lanes}): {dt*1e3:8.2f} ms   data={gb:.2f} GB")
    return dt


# ---------------------------------------- 2. manual-DMA passthrough pod pass
def _pass_kernel(kh, ph, ko, po, kv, pv, sems, *, ntiles_pod, stride_tiles):
    g = pl.program_id(0)
    lane_blk = pl.program_id(1)
    # pod tile indices: bits [b0, b0+c) vary, where stride_tiles = 2**b0
    base = g  # assemble: low bits below stride, high bits above
    s = stride_tiles
    k = ntiles_pod
    lo = base % s if s > 1 else 0
    hi = (base // s) if s > 1 else base
    dmas = []
    for j in range(k):
        t = (hi * k + j) * s + lo
        d1 = pltpu.make_async_copy(
            kh.at[pl.ds(t * TILE, TILE), pl.ds(lane_blk * LANES, LANES)],
            kv.at[pl.ds(j * TILE, TILE), :],
            sems.at[0],
        )
        d2 = pltpu.make_async_copy(
            ph.at[pl.ds(t * TILE, TILE), pl.ds(lane_blk * LANES, LANES)],
            pv.at[pl.ds(j * TILE, TILE), :],
            sems.at[1],
        )
        d1.start()
        d2.start()
        dmas += [d1, d2]
    for d in dmas:
        d.wait()
    kv[:] = kv[:] + 1.0  # touch
    pv[:] = pv[:] + 1
    dmas = []
    for j in range(k):
        t = (hi * k + j) * s + lo
        d1 = pltpu.make_async_copy(
            kv.at[pl.ds(j * TILE, TILE), :],
            ko.at[pl.ds(t * TILE, TILE), pl.ds(lane_blk * LANES, LANES)],
            sems.at[2],
        )
        d2 = pltpu.make_async_copy(
            pv.at[pl.ds(j * TILE, TILE), :],
            po.at[pl.ds(t * TILE, TILE), pl.ds(lane_blk * LANES, LANES)],
            sems.at[3],
        )
        d1.start()
        d2.start()
        dmas += [d1, d2]
    for d in dmas:
        d.wait()


def bench_dma_pass(ntiles, pod_tiles, stride_tiles, lanes=LANES):
    n = ntiles * TILE
    k = jax.device_put(np.random.rand(n, lanes).astype(np.float32))
    p = jax.device_put(np.arange(n * lanes, dtype=np.int32).reshape(n, lanes))

    grid = (ntiles // pod_tiles, lanes // LANES)
    fn = pl.pallas_call(
        functools.partial(
            _pass_kernel, ntiles_pod=pod_tiles, stride_tiles=stride_tiles
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n, lanes), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((pod_tiles * TILE, LANES), jnp.float32),
            pltpu.VMEM((pod_tiles * TILE, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    f = jax.jit(fn)
    dt = timeit(f, k, p)
    gb = 2 * n * lanes * 8 / 1e9  # read + write
    print(
        f"dma_pass    (T={ntiles}, pod={pod_tiles}, s={stride_tiles}): "
        f"{dt*1e3:8.2f} ms   {gb/dt:6.1f} GB/s eff"
    )
    return dt


# ------------------------------------- 2b. contiguous one-DMA-per-pod variant
def _pass_kernel_contig(kh, ph, ko, po, kv, pv, sems, *, ntiles_pod):
    g = pl.program_id(0)
    rows = ntiles_pod * TILE
    d1 = pltpu.make_async_copy(kh.at[pl.ds(g * rows, rows), :], kv, sems.at[0])
    d2 = pltpu.make_async_copy(ph.at[pl.ds(g * rows, rows), :], pv, sems.at[1])
    d1.start()
    d2.start()
    d1.wait()
    d2.wait()
    kv[:] = kv[:] + 1.0
    pv[:] = pv[:] + 1
    d3 = pltpu.make_async_copy(kv, ko.at[pl.ds(g * rows, rows), :], sems.at[2])
    d4 = pltpu.make_async_copy(pv, po.at[pl.ds(g * rows, rows), :], sems.at[3])
    d3.start()
    d4.start()
    d3.wait()
    d4.wait()


def bench_dma_contig(ntiles, pod_tiles, lanes=LANES):
    n = ntiles * TILE
    k = jax.device_put(np.random.rand(n, lanes).astype(np.float32))
    p = jax.device_put(np.arange(n * lanes, dtype=np.int32).reshape(n, lanes))
    fn = pl.pallas_call(
        functools.partial(_pass_kernel_contig, ntiles_pod=pod_tiles),
        grid=(ntiles // pod_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n, lanes), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((pod_tiles * TILE, LANES), jnp.float32),
            pltpu.VMEM((pod_tiles * TILE, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    f = jax.jit(fn)
    dt = timeit(f, k, p)
    gb = 2 * n * lanes * 8 / 1e9
    print(
        f"dma_contig  (T={ntiles}, pod={pod_tiles}): "
        f"{dt*1e3:8.2f} ms   {gb/dt:6.1f} GB/s eff"
    )
    return dt


# ------------------------------------------------------- 3. phase-A pod sort
def _cmpx_reshape(keys, payload, stride, stage, dir_bit):
    t, lanes = keys.shape
    g = t // (2 * stride)
    k4 = keys.reshape(g, 2, stride, lanes)
    p4 = payload.reshape(g, 2, stride, lanes)
    lo_k, hi_k = k4[:, 0], k4[:, 1]
    lo_p, hi_p = p4[:, 0], p4[:, 1]
    if stage >= t:
        desc = jnp.full((g, stride, lanes), dir_bit, dtype=jnp.int32) == 1
    else:
        grp = jax.lax.broadcasted_iota(jnp.int32, (g, stride, lanes), 0)
        desc = (grp & (stage // (2 * stride))) != 0
    swap = (lo_k > hi_k) != desc
    keys = jnp.stack(
        [jnp.where(swap, hi_k, lo_k), jnp.where(swap, lo_k, hi_k)], axis=1
    ).reshape(t, lanes)
    payload = jnp.stack(
        [jnp.where(swap, hi_p, lo_p), jnp.where(swap, lo_p, hi_p)], axis=1
    ).reshape(t, lanes)
    return keys, payload


def _cmpx_rotate(keys, payload, stride, stage, dir_bit):
    t = keys.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, LANES), 0)
    is_lo = (rows & stride) == 0
    fwd_k = pltpu.roll(keys, t - stride, 0)
    bwd_k = pltpu.roll(keys, stride, 0)
    fwd_p = pltpu.roll(payload, t - stride, 0)
    bwd_p = pltpu.roll(payload, stride, 0)
    partner_k = jnp.where(is_lo, fwd_k, bwd_k)
    partner_p = jnp.where(is_lo, fwd_p, bwd_p)
    lo_k = jnp.where(is_lo, keys, partner_k)
    hi_k = jnp.where(is_lo, partner_k, keys)
    lo_p = jnp.where(is_lo, payload, partner_p)
    hi_p = jnp.where(is_lo, partner_p, payload)
    if stage >= t:
        desc = jnp.full((t, LANES), dir_bit, dtype=jnp.int32) == 1
    else:
        desc = (rows & stage) != 0
    swap = (lo_k > hi_k) != desc
    new_lo_k = jnp.where(swap, hi_k, lo_k)
    new_hi_k = jnp.where(swap, lo_k, hi_k)
    new_lo_p = jnp.where(swap, hi_p, lo_p)
    new_hi_p = jnp.where(swap, lo_p, hi_p)
    keys = jnp.where(is_lo, new_lo_k, new_hi_k)
    payload = jnp.where(is_lo, new_lo_p, new_hi_p)
    return keys, payload


def _cmpx(keys, payload, stride, stage, dir_bit):
    if stride >= 8 and keys.shape[0] % (2 * stride) == 0:
        return _cmpx_reshape(keys, payload, stride, stage, dir_bit)
    return _cmpx_rotate(keys, payload, stride, stage, dir_bit)


def _phase_a_kernel(kh, ph, ko, po, kv, pv, sems, *, pod_rows):
    g = pl.program_id(0)
    lane_blk = pl.program_id(1)
    d1 = pltpu.make_async_copy(
        kh.at[pl.ds(g * pod_rows, pod_rows), pl.ds(lane_blk * LANES, LANES)],
        kv, sems.at[0],
    )
    d2 = pltpu.make_async_copy(
        ph.at[pl.ds(g * pod_rows, pod_rows), pl.ds(lane_blk * LANES, LANES)],
        pv, sems.at[1],
    )
    d1.start()
    d2.start()
    d1.wait()
    d2.wait()
    keys, payload = kv[:], pv[:]
    stage = 2
    while stage <= pod_rows:
        dir_bit = (g & 1) if stage == pod_rows else jnp.int32(0)
        stride = stage // 2
        while stride >= 1:
            keys, payload = _cmpx(keys, payload, stride, stage, dir_bit)
            stride //= 2
        stage *= 2
    kv[:] = keys
    pv[:] = payload
    d1 = pltpu.make_async_copy(
        kv,
        ko.at[pl.ds(g * pod_rows, pod_rows), pl.ds(lane_blk * LANES, LANES)],
        sems.at[2],
    )
    d2 = pltpu.make_async_copy(
        pv,
        po.at[pl.ds(g * pod_rows, pod_rows), pl.ds(lane_blk * LANES, LANES)],
        sems.at[3],
    )
    d1.start()
    d2.start()
    d1.wait()
    d2.wait()


def bench_phase_a(ntiles, pod_tiles, lanes=LANES):
    n = ntiles * TILE
    pod_rows = pod_tiles * TILE
    k = jax.device_put(np.random.rand(n, lanes).astype(np.float32))
    p = jax.device_put(np.arange(n * lanes, dtype=np.int32).reshape(n, lanes))
    fn = pl.pallas_call(
        functools.partial(_phase_a_kernel, pod_rows=pod_rows),
        grid=(ntiles // pod_tiles, lanes // LANES),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, lanes), jnp.float32),
            jax.ShapeDtypeStruct((n, lanes), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((pod_rows, LANES), jnp.float32),
            pltpu.VMEM((pod_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    f = jax.jit(fn)
    # correctness spot check (small readbacks only: the tunnel is slow)
    ks, ps = f(k, p)
    knp = np.asarray(k[: 2 * pod_rows, :2])
    for blk in range(2):
        seg = np.asarray(ks[blk * pod_rows : (blk + 1) * pod_rows, :2])
        want = np.sort(knp[blk * pod_rows : (blk + 1) * pod_rows], axis=0)
        if blk % 2 == 1:
            want = want[::-1]
        assert np.array_equal(seg, want), f"phase A wrong at block {blk}"
    dt = timeit(f, k, p)
    nst = (pod_rows.bit_length() - 1) * pod_rows.bit_length() // 2
    print(
        f"phase_a     (T={ntiles}, pod={pod_tiles} [{pod_rows} rows], "
        f"{nst} stages): {dt*1e3:8.2f} ms"
    )
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    # pods must tile evenly: ntiles % (pod_tiles * stride_tiles) == 0
    ntiles = 512  # 1.048M rows
    if which in ("all", "xla"):
        bench_xla_sort(ntiles * TILE)
    if which in ("all", "dma"):
        bench_dma_pass(ntiles, pod_tiles=16, stride_tiles=1)
        bench_dma_pass(ntiles, pod_tiles=16, stride_tiles=16)
        bench_dma_pass(ntiles, pod_tiles=8, stride_tiles=64)
    if which in ("all", "contig"):
        bench_dma_contig(ntiles, pod_tiles=16)
        bench_dma_contig(ntiles, pod_tiles=4)
    if which in ("all", "phasea"):
        bench_phase_a(ntiles, pod_tiles=8)
        bench_phase_a(ntiles, pod_tiles=16)
