"""On-device histogram gradient-boosted trees for the R* diagnostic.

The reference delegates classification to external MLJ models (EvoTrees /
XGBoost, src/rstar.jl:47-57). This is the TPU-native default classifier: a
jitted multiclass softmax GBT with

- quantile-binned features (uint8 bins, static ``n_bins``),
- depth-``max_depth`` oblivious trees grown level-by-level: every node at a
  level is split simultaneously, so the whole forest state is fixed-shape
  arrays and the training loop is a ``lax.fori_loop`` over rounds
  (no data-dependent Python control flow — XLA compiles one graph),
- histogram split finding via one scatter-add per level: gradients and
  hessians are accumulated into a ``(nodes, features, bins)`` histogram and
  the best split maximizes the usual gain
  ``GL^2/(HL+lam) + GR^2/(HR+lam) - G^2/(H+lam)``,
- one tree per class per round with softmax cross-entropy gradients.

Scatter-adds and the cumulative-histogram scans are VPU work; the dominant
softmax/logit updates are dense (n, K) elementwise ops that XLA fuses.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GBTState(NamedTuple):
    split_feature: jnp.ndarray  # (rounds, K, inner_nodes) int32
    split_bin: jnp.ndarray  # (rounds, K, inner_nodes) int32
    leaf_value: jnp.ndarray  # (rounds, K, leaves) float32
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
                f"GBTClassifier: fitted {self.n_rounds} rounds x {num_classes} "
                f"classes, depth {self.max_depth}"
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
    onehot = jax.nn.one_hot(y, num_classes, dtype=jnp.float32)  # (n, K)

    def fit_tree(g, h):
        """Fit one depth-`max_depth` tree on gradients g/h (n,). Returns
        (split_feature (inner,), split_bin (inner,), leaf_value (leaves,))."""
        node = jnp.zeros((n,), jnp.int32)  # node id within current level
        feat_out = jnp.zeros((inner,), jnp.int32)
        bin_out = jnp.zeros((inner,), jnp.int32)

        # level-by-level growth; max_depth is small and static, so the Python
        # loop unrolls into one fixed graph with per-level histogram shapes
        for depth in range(max_depth):
            n_nodes = 2**depth
            level_offset = 2**depth - 1
            seg = (
                node[:, None] * (nfeat * n_bins)
                + jnp.arange(nfeat, dtype=jnp.int32)[None, :] * n_bins
                + binned
            )  # (n, F)
            size = n_nodes * nfeat * n_bins
            hist_g = (
                jnp.zeros((size,), jnp.float32)
                .at[seg.reshape(-1)]
                .add(jnp.broadcast_to(g[:, None], (n, nfeat)).reshape(-1))
                .reshape(n_nodes, nfeat, n_bins)
            )
            hist_h = (
                jnp.zeros((size,), jnp.float32)
                .at[seg.reshape(-1)]
                .add(jnp.broadcast_to(h[:, None], (n, nfeat)).reshape(-1))
                .reshape(n_nodes, nfeat, n_bins)
            )
            gl = jnp.cumsum(hist_g, axis=2)  # left sums for split at bin b
            hl = jnp.cumsum(hist_h, axis=2)
            gtot = gl[:, :, -1:]
            htot = hl[:, :, -1:]
            gr = gtot - gl
            hr = htot - hl
            gain = (
                gl**2 / (hl + reg_lambda)
                + gr**2 / (hr + reg_lambda)
                - gtot**2 / (htot + reg_lambda)
            )
            valid = (hl >= min_child_weight) & (hr >= min_child_weight)
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

        # leaf values from final node assignment
        leaf_g = jnp.zeros((leaves,), jnp.float32).at[node].add(g)
        leaf_h = jnp.zeros((leaves,), jnp.float32).at[node].add(h)
        leaf_value = -learning_rate * leaf_g / (leaf_h + reg_lambda)
        return feat_out, bin_out, leaf_value, node

    def round_step(logits, _):
        p = jax.nn.softmax(logits, axis=1)  # (n, K)
        g_all = p - onehot
        h_all = p * (1.0 - p)

        def per_class(c):
            return fit_tree(g_all[:, c], h_all[:, c])

        feats, bins_, leaf_vals, nodes = jax.vmap(per_class)(
            jnp.arange(num_classes)
        )
        # apply updates: logits[:, c] += leaf_vals[c, node_c]
        updates = jnp.take_along_axis(leaf_vals, nodes, axis=1)  # (K, n)
        logits = logits + updates.T
        return logits, (feats, bins_, leaf_vals)

    logits0 = jnp.zeros((n, num_classes), jnp.float32)
    _, (sf, sb, lv) = jax.lax.scan(round_step, logits0, None, length=n_rounds)
    return sf, sb, lv  # (rounds, K, inner/leaves)


@partial(jax.jit, static_argnames=("max_depth",))
def _predict_logits(binned, split_feature, split_bin, leaf_value, max_depth: int):
    n = binned.shape[0]
    rounds, k, _ = split_feature.shape

    def walk(sf, sb, lv):
        """Route all samples through one tree; sf/sb (inner,), lv (leaves,)."""
        node = jnp.zeros((n,), jnp.int32)
        for depth in range(max_depth):
            offset = 2**depth - 1
            idx = offset + node
            f = sf[idx]
            b = sb[idx]
            xf = jnp.take_along_axis(binned, f[:, None], axis=1)[:, 0]
            node = node * 2 + (xf > b).astype(jnp.int32)
        return lv[node]  # (n,)

    per_tree = jax.vmap(jax.vmap(walk, in_axes=(0, 0, 0)), in_axes=(0, 0, 0))
    contrib = per_tree(split_feature, split_bin, leaf_value)  # (rounds, K, n)
    return jnp.sum(contrib, axis=0).T  # (n, K)
