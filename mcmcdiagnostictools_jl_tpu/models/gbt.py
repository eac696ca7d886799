"""On-device histogram gradient-boosted trees for the R* diagnostic.

The reference delegates classification to external MLJ models (EvoTrees /
XGBoost, src/rstar.jl:47-57). This is the TPU-native default classifier: a
jitted multiclass softmax GBT designed around the MXU rather than around
scatter ops:

- quantile-binned features (static ``n_bins``),
- **shared-structure multi-output trees** (the "multi-output tree" strategy of
  modern XGBoost/LightGBM): ONE tree per boosting round whose structure is
  shared by all classes and whose leaves carry K-dimensional logit updates.
  The split gain is the per-class gain summed over classes. This is the
  TPU-native choice because node assignment is shared, so gradient/hessian
  histograms for ALL classes accumulate in a single matmul,
- **matmul histograms**: instead of scatter-adds (which serialize on TPU and
  previously hard-faulted the worker at K~500 classes), the (node, bin)
  one-hot matrix ``(n, nodes*bins)`` is contracted against the stacked
  gradient/hessian matrix ``(n, 2K)`` on the MXU — one pass per feature via
  ``lax.scan``,
- trees grown level-by-level (oblivious layout): every node of a level splits
  simultaneously, so the forest state is fixed-shape arrays and the training
  loop is a ``lax.scan`` over rounds — no data-dependent Python control flow,
  one compiled graph.

Complexity per round: ``max_depth * F`` matmuls of shape
``(n, nodes*bins) x (n, 2K)`` plus one dense softmax over ``(n, K)`` — all
MXU/VPU-friendly, zero scatters, zero gathers beyond per-level routing.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GBTState(NamedTuple):
    split_feature: jnp.ndarray  # (rounds, inner_nodes) int32
    split_bin: jnp.ndarray  # (rounds, inner_nodes) int32
    leaf_value: jnp.ndarray  # (rounds, leaves, K) float32
    bin_edges: jnp.ndarray  # (features, n_bins-1) quantile bin edges
    num_classes: int


@dataclass(frozen=True)
class GBTClassifier:
    """Histogram GBT classifier implementing the R* classifier protocol.

    ``fit(X, y, num_classes) -> state``; ``predict_proba(state, X) -> (n, K)``;
    ``predict(state, X) -> labels``. ``probabilistic`` selects which R*
    algorithm applies (1: deterministic, 2: Poisson-binomial distribution).
    """

    n_rounds: int = 100
    learning_rate: float = 0.1
    max_depth: int = 3
    n_bins: int = 64
    reg_lambda: float = 1.0
    min_child_weight: float = 1.0
    probabilistic: bool = True

    def fit(self, x, y, num_classes: int, verbosity: int = 0) -> GBTState:
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.int32)
        edges = _quantile_bin_edges(x, self.n_bins)
        binned = _bin_features(x, edges)  # (n, F) int32
        sf, sb, lv = _fit_gbt(
            binned,
            y,
            num_classes=num_classes,
            n_rounds=self.n_rounds,
            learning_rate=self.learning_rate,
            max_depth=self.max_depth,
            n_bins=self.n_bins,
            reg_lambda=self.reg_lambda,
            min_child_weight=self.min_child_weight,
        )
        if verbosity > 0:
            print(
                f"GBTClassifier: fitted {self.n_rounds} multi-output trees "
                f"({num_classes} classes, depth {self.max_depth})"
            )
        return GBTState(sf, sb, lv, edges, num_classes)

    def predict_logits(self, state: GBTState, x):
        binned = _bin_features(jnp.asarray(x, jnp.float32), state.bin_edges)
        return _predict_logits(
            binned, state.split_feature, state.split_bin, state.leaf_value,
            self.max_depth,
        )

    def predict_proba(self, state: GBTState, x):
        return jax.nn.softmax(self.predict_logits(state, x), axis=-1)

    def predict(self, state: GBTState, x):
        return jnp.argmax(self.predict_logits(state, x), axis=-1)


def deterministic(classifier: GBTClassifier) -> GBTClassifier:
    """Mode-predicting version (the reference's ``Pipeline(...; predict_mode)``
    construction, src/rstar.jl:198-209)."""
    from dataclasses import replace

    return replace(classifier, probabilistic=False)


# ---------------------------------------------------------------------------
# binning
# ---------------------------------------------------------------------------


def _quantile_bin_edges(x, n_bins: int):
    """(F, n_bins-1) per-feature quantile edges from the training data."""
    qs = jnp.linspace(0.0, 1.0, n_bins + 1)[1:-1]
    return jnp.quantile(x, qs, axis=0).T  # (F, n_bins-1)


def _bin_features(x, edges):
    """Digitize features into [0, n_bins) via the quantile edges."""
    # edges: (F, B-1); x: (n, F) -> count of edges < x
    return jnp.sum(x[:, :, None] > edges[None, :, :], axis=2).astype(jnp.int32)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "num_classes", "n_rounds", "learning_rate", "max_depth", "n_bins",
        "reg_lambda", "min_child_weight",
    ),
)
def _fit_gbt(binned, y, *, num_classes, n_rounds, learning_rate, max_depth,
             n_bins, reg_lambda, min_child_weight):
    n, nfeat = binned.shape
    inner = 2**max_depth - 1
    leaves = 2**max_depth
    k = num_classes
    onehot = jax.nn.one_hot(y, k, dtype=jnp.float32)  # (n, K)

    def grow_tree(gh):
        """Grow one shared-structure tree on stacked grads/hessians gh (n, 2K).

        Returns (split_feature (inner,), split_bin (inner,),
        leaf_value (leaves, K), node (n,))."""
        node = jnp.zeros((n,), jnp.int32)  # node id within current level
        feat_out = jnp.zeros((inner,), jnp.int32)
        bin_out = jnp.zeros((inner,), jnp.int32)

        # level-by-level growth; max_depth is small and static, so the Python
        # loop unrolls into one fixed graph with per-level histogram shapes
        for depth in range(max_depth):
            n_nodes = 2**depth
            level_offset = 2**depth - 1

            # (node, feature, bin) one-hot against stacked grads: ONE MXU
            # contraction accumulates the histograms of every class, node,
            # feature, and bin simultaneously. Features are chunked only when
            # the one-hot would exceed ~256 MB; the common case is one chunk
            # (a single flat einsum keeps the HLO small — nested scans inside
            # the rounds scan made remote compilation pathological).
            cols_per_feat = n_nodes * n_bins
            max_feats = max(
                1, (256 * 1024 * 1024) // (4 * n * cols_per_feat)
            )
            hist_parts = []
            for f0 in range(0, nfeat, max_feats):
                fs = slice(f0, min(f0 + max_feats, nfeat))
                nf = fs.stop - fs.start
                seg = (
                    node[:, None] * n_bins + binned[:, fs]
                )  # (n, nf) in [0, nodes*B)
                oh = jax.nn.one_hot(
                    seg, cols_per_feat, dtype=jnp.float32
                )  # (n, nf, nodes*B)
                hist_parts.append(
                    jnp.einsum(
                        "nfc,nk->fck", oh, gh,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                )  # (nf, nodes*B, 2K)
            hists = (
                hist_parts[0] if len(hist_parts) == 1
                else jnp.concatenate(hist_parts, axis=0)
            )
            # (F, nodes*B, 2K) -> (nodes, F, B, 2K)
            hist = hists.reshape(nfeat, n_nodes, n_bins, 2 * k).transpose(
                1, 0, 2, 3
            )
            gl = jnp.cumsum(hist[..., :k], axis=2)  # left sums at split bin b
            hl = jnp.cumsum(hist[..., k:], axis=2)
            gtot = gl[:, :, -1:, :]
            htot = hl[:, :, -1:, :]
            gr = gtot - gl
            hr = htot - hl
            # multi-output gain: per-class gain summed over classes
            gain = jnp.sum(
                gl**2 / (hl + reg_lambda)
                + gr**2 / (hr + reg_lambda)
                - gtot**2 / (htot + reg_lambda),
                axis=3,
            )  # (nodes, F, B)
            hl_sum = jnp.sum(hl, axis=3)
            hr_sum = jnp.sum(hr, axis=3)
            valid = (hl_sum >= min_child_weight) & (hr_sum >= min_child_weight)
            gain = jnp.where(valid, gain, -jnp.inf)
            gain = gain[:, :, :-1]  # split "<= bin b" for b < B-1
            flat_gain = gain.reshape(n_nodes, -1)
            best = jnp.argmax(flat_gain, axis=1)  # (n_nodes,)
            best_gain = jnp.take_along_axis(flat_gain, best[:, None], axis=1)[:, 0]
            bf = (best // (n_bins - 1)).astype(jnp.int32)
            bb = (best % (n_bins - 1)).astype(jnp.int32)
            # no-gain nodes: degenerate split sending everything left
            usable = jnp.isfinite(best_gain) & (best_gain > 0)
            bb = jnp.where(usable, bb, n_bins - 1)  # all bins <= B-1 -> left
            feat_out = jax.lax.dynamic_update_slice(feat_out, bf, (level_offset,))
            bin_out = jax.lax.dynamic_update_slice(bin_out, bb, (level_offset,))
            # route samples
            xf = jnp.take_along_axis(binned, bf[node][:, None], axis=1)[:, 0]
            go_right = xf > bb[node]
            node = node * 2 + go_right.astype(jnp.int32)

        # K-dim leaf values from the final node assignment (matmul, no scatter)
        leaf_oh = jax.nn.one_hot(node, leaves, dtype=jnp.float32)  # (n, leaves)
        sums = jnp.einsum(
            "nl,nk->lk", leaf_oh, gh, precision=jax.lax.Precision.HIGHEST
        )  # (leaves, 2K)
        leaf_value = -learning_rate * sums[:, :k] / (sums[:, k:] + reg_lambda)
        return feat_out, bin_out, leaf_value, node

    def round_step(logits, _):
        p = jax.nn.softmax(logits, axis=1)  # (n, K)
        g = p - onehot
        h = p * (1.0 - p)
        feats, bins_, leaf_vals, node = grow_tree(
            jnp.concatenate([g, h], axis=1)
        )
        logits = logits + leaf_vals[node]  # (n, K) gather by shared node id
        return logits, (feats, bins_, leaf_vals)

    logits0 = jnp.zeros((n, k), jnp.float32)
    _, (sf, sb, lv) = jax.lax.scan(round_step, logits0, None, length=n_rounds)
    return sf, sb, lv  # (rounds, inner), (rounds, inner), (rounds, leaves, K)


@partial(jax.jit, static_argnames=("max_depth",))
def _predict_logits(binned, split_feature, split_bin, leaf_value, max_depth: int):
    n = binned.shape[0]
    k = leaf_value.shape[-1]

    def per_round(logits, tree):
        sf, sb, lv = tree  # (inner,), (inner,), (leaves, K)
        node = jnp.zeros((n,), jnp.int32)
        for depth in range(max_depth):
            offset = 2**depth - 1
            idx = offset + node
            f = sf[idx]
            b = sb[idx]
            xf = jnp.take_along_axis(binned, f[:, None], axis=1)[:, 0]
            node = node * 2 + (xf > b).astype(jnp.int32)
        return logits + lv[node], None

    logits0 = jnp.zeros((n, k), jnp.float32)
    logits, _ = jax.lax.scan(
        per_round, logits0, (split_feature, split_bin, leaf_value)
    )
    return logits
