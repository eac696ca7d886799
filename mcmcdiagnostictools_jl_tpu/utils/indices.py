"""Grouping / stratified-split index utilities (host-side, R* path).

These mirror the behavioral contracts of the reference utilities
(src/utils.jl:50-141): deterministic sorted group order, non-greedy chain
splitting where earlier splits receive the remainder draws, and per-class
stratified shuffling with ``round(N * frac)`` items per class.

They run on the host with NumPy: they operate on small integer id vectors in
the R* / nested-R-hat validation paths, never on draws.
"""

from __future__ import annotations

import numpy as np


def unique_indices(x):
    """Sorted unique values of ``x`` and, for each, the indices where it occurs.

    Returns ``(uniques, indices)`` with ``uniques`` sorted ascending and
    ``indices[i]`` the (ascending) positions of ``uniques[i]`` in ``x``.
    Reference: ``unique_indices`` src/utils.jl:50-64 (sorted order is part of
    the contract, exercised by test/utils.jl:19).
    """
    x = np.asarray(x).reshape(-1)
    order = np.argsort(x, kind="stable")
    xs = x[order]
    boundaries = np.flatnonzero(np.concatenate(([True], xs[1:] != xs[:-1])))
    uniques = xs[boundaries]
    indices = [np.sort(g) for g in np.split(order, boundaries[1:])]
    return uniques, indices


def split_chain_indices(chain_inds, split: int = 2):
    """Relabel a chain-id vector so each chain becomes ``split`` chains.

    Entries of each chain are assumed ordered by iteration. The partition is
    non-greedy: with ``n = len(chain)`` and ``r = n % split``, the first ``r``
    splits get ``n // split + 1`` draws and the rest ``n // split`` (reference
    src/utils.jl:78-105). New chain ids are consecutive from 1, grouped by the
    sorted original ids.
    """
    chain_inds = np.asarray(chain_inds)
    out = np.empty_like(chain_inds, dtype=np.int64)
    if split == 1:
        return chain_inds.astype(np.int64).copy()
    _, indices = unique_indices(chain_inds)
    next_id = 1
    for inds in indices:
        n = len(inds)
        base, rem = divmod(n, split)
        start = 0
        for j in range(split):
            take = base + (1 if j < rem else 0)
            out[inds[start : start + take]] = next_id
            start += take
            next_id += 1
    return out


def shuffle_split_stratified(rng: np.random.Generator, group_ids, frac: float):
    """Split indices of ``group_ids`` into two groups with per-class balance.

    For each class, ``round(N_class * frac)`` shuffled indices go to the first
    group and the rest to the second (reference src/utils.jl:120-141). Uses
    banker's rounding like Julia's ``round(Int, x)``.
    """
    group_ids = np.asarray(group_ids)
    inds1, inds2 = [], []
    _, indices = unique_indices(group_ids)
    for inds in indices:
        n = len(inds)
        n1 = int(np.rint(n * frac))
        perm = rng.permutation(inds)
        inds1.append(perm[:n1])
        inds2.append(perm[n1:])
    return np.concatenate(inds1), np.concatenate(inds2)
