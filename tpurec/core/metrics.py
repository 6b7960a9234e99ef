"""Streaming metrics (jit-friendly, functional state).

The reference relies on ``tf.keras.metrics.AUC`` + ``Mean``
(2.FM/ModelManager.py:107-109; dual AUC at 4.MMOE/ModelManager.py:104-107).
Keras' AUC is a thresholded/bucketed streaming estimator; this module
implements the same bucketed-histogram design as pure JAX so the metric state
lives inside the jitted eval step and is psum-able across the data axis.

State is a plain dict of arrays (a pytree), updates are pure functions.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
State = Dict[str, Array]


class AUC:
    """Streaming ROC-AUC via per-bucket positive/negative histograms.

    Predictions must be probabilities in [0, 1]. With ``num_buckets`` B the
    estimator is exact up to within-bucket ties (trapezoidal interpolation),
    matching Keras' ``AUC(num_thresholds=B)`` behaviour; we default to a
    finer grid than Keras' 200 since the histogram is O(B) memory either way.
    """

    def __init__(self, num_buckets: int = 2048, dtype=jnp.float32):
        self.num_buckets = int(num_buckets)
        self.dtype = dtype

    def init(self) -> State:
        z = jnp.zeros((self.num_buckets,), self.dtype)
        return {"pos": z, "neg": z}

    def update(
        self,
        state: State,
        y_true: Array,
        y_pred: Array,
        weight: Optional[Array] = None,
    ) -> State:
        y_true = y_true.reshape(-1).astype(self.dtype)
        y_pred = y_pred.reshape(-1).astype(self.dtype)
        w = (
            jnp.ones_like(y_pred)
            if weight is None
            else weight.reshape(-1).astype(self.dtype)
        )
        b = jnp.clip(
            (y_pred * self.num_buckets).astype(jnp.int32), 0, self.num_buckets - 1
        )
        pos = state["pos"].at[b].add(w * y_true)
        neg = state["neg"].at[b].add(w * (1.0 - y_true))
        return {"pos": pos, "neg": neg}

    def merge(self, a: State, b: State) -> State:
        return {"pos": a["pos"] + b["pos"], "neg": a["neg"] + b["neg"]}

    def result(self, state: State) -> Array:
        # tp[k] / fp[k]: #pos / #neg predicted above bucket boundary k
        # (k = 0 .. B, from "everything positive" to "nothing positive")
        pos, neg = state["pos"], state["neg"]
        total_pos = jnp.sum(pos)
        total_neg = jnp.sum(neg)
        rev_tp = jnp.concatenate([jnp.cumsum(pos[::-1])[::-1], jnp.zeros((1,))])
        rev_fp = jnp.concatenate([jnp.cumsum(neg[::-1])[::-1], jnp.zeros((1,))])
        tpr = rev_tp / jnp.maximum(total_pos, 1.0)
        fpr = rev_fp / jnp.maximum(total_neg, 1.0)
        auc = jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) * 0.5)
        valid = (total_pos > 0) & (total_neg > 0)
        return jnp.where(valid, auc, 0.0)


class Mean:
    """Streaming weighted mean (Keras ``Mean`` equivalent)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype

    def init(self) -> State:
        return {"total": jnp.zeros((), self.dtype), "count": jnp.zeros((), self.dtype)}

    def update(
        self, state: State, value: Array, weight: Optional[Array] = None
    ) -> State:
        value = jnp.asarray(value, self.dtype).reshape(-1)
        w = (
            jnp.ones_like(value)
            if weight is None
            else jnp.asarray(weight, self.dtype).reshape(-1)
        )
        return {
            "total": state["total"] + jnp.sum(value * w),
            "count": state["count"] + jnp.sum(w),
        }

    def merge(self, a: State, b: State) -> State:
        return {"total": a["total"] + b["total"], "count": a["count"] + b["count"]}

    def result(self, state: State) -> Array:
        return state["total"] / jnp.maximum(state["count"], 1.0)


class MetricBundle:
    """Named collection of metrics with one pytree state.

    ``bundle.update(state, auc=(y, p), loss=(value,))`` — each metric gets its
    update args as a tuple keyed by metric name.
    """

    def __init__(self, metrics: Mapping[str, object]):
        self.metrics = dict(metrics)

    def init(self) -> Dict[str, State]:
        return {k: m.init() for k, m in self.metrics.items()}

    def update(self, state: Dict[str, State], **updates) -> Dict[str, State]:
        out = dict(state)
        for name, args in updates.items():
            out[name] = self.metrics[name].update(state[name], *args)
        return out

    def result(self, state: Dict[str, State]) -> Dict[str, Array]:
        return {k: m.result(state[k]) for k, m in self.metrics.items()}


def exact_auc(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Exact (non-streaming) ROC-AUC via the rank statistic; host-side, used
    by tests and small offline evals as the oracle for the streaming AUC."""
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    order = np.argsort(y_pred, kind="mergesort")
    sorted_pred = y_pred[order]
    sorted_true = y_true[order]
    # average ranks over ties
    n = len(y_pred)
    ranks = np.empty(n, dtype=np.float64)
    i = 0
    while i < n:
        j = i
        while j + 1 < n and sorted_pred[j + 1] == sorted_pred[i]:
            j += 1
        ranks[i : j + 1] = 0.5 * (i + j) + 1.0
        i = j + 1
    n_pos = sorted_true.sum()
    n_neg = n - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.0
    return float((ranks[sorted_true == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
