"""Sparse embedding-update engine.

The profiled bottleneck of recsys training steps is the optimizer's dense
update of the embedding table: Adam reads and writes the full (V, D) table
plus two moment arrays every step — O(7·V·D) HBM traffic — even though a
batch touches only U ≪ V rows. This engine makes the whole embedding path
O(U·D):

1. ``unique_fixed``  — fixed-shape sorted unique of the batch's ids
   (duplicates routed to a sacrificial padding row, so shapes stay static
   for XLA)
2. forward           — the trainer gathers ``rows = table[uniq]`` *outside*
   the differentiated function and hands them to the model through the
   'sparse_rows'/'sparse_ids' flax collections; ``SharedEmbedding`` resolves
   ids against ``uniq`` by binary search and gathers from ``rows``
3. backward          — autodiff produces ``d_rows`` of shape (U, D); no
   table-shaped gradient is ever materialized
4. ``sparse_adam``   — gathers m/v at ``uniq``, applies the Adam math on
   (U, D) blocks, scatters rows/moments back

No reference counterpart (the reference is a toy-scale eager TF loop); this
is the subsystem that makes the framework production-scale (BASELINE.json
north star: sharded tables + high examples/s/chip).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def unique_fixed(ids: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """Sorted fixed-size unique: duplicates are replaced by ``pad_id`` and
    sorted to the end. Output shape == input shape (static for XLA).

    ``pad_id`` must be a valid (sacrificial) row index — SharedEmbedding's
    vocab padding guarantees at least one spare row past the real vocab.
    """
    flat = jnp.sort(ids.reshape(-1))
    first = jnp.concatenate([jnp.ones((1,), bool), flat[1:] != flat[:-1]])
    marked = jnp.where(first, flat, pad_id)
    return jnp.sort(marked)


def lookup_positions(uniq: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Positions of ``ids`` inside the sorted ``uniq`` vector (exact matches
    guaranteed by construction).

    NOTE: searchsorted lowers to a sequential while-loop on TPU (measured
    ~65 ms at U=164k inside a fused step) — the trainer avoids this entirely
    with ``unique_with_positions`` + batch rewriting; this helper remains for
    host-side/small uses."""
    return jnp.searchsorted(uniq, ids)


def unique_with_positions(
    flat_ids: jnp.ndarray, pad_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-argsort unique + inverse positions (no binary search, no while
    loops — TPU-friendly: sort, cumsum, two 1-D scatters).

    Returns (uniq (N+1,), positions (N,)):
    - ``uniq`` is compacted ascending unique ids, padded with ``pad_id``;
      a synthetic id 0 is always injected so that slot 0 == id 0 — the
      padding index keeps its value in position space, so sequence masks
      computed against padding_index survive the trainer's batch rewrite.
    - ``positions[i]`` is the slot of ``flat_ids[i]`` in ``uniq``.
    """
    flat = jnp.concatenate(
        [jnp.zeros((1,), flat_ids.dtype), flat_ids.reshape(-1)]
    )
    n = flat.shape[0]
    order = jnp.argsort(flat)
    sorted_ids = jnp.take(flat, order)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    slot = jnp.cumsum(first) - 1  # position of each sorted element's value
    uniq = jnp.full((n,), pad_id, flat.dtype).at[slot].set(sorted_ids)
    positions = jnp.zeros((n,), slot.dtype).at[order].set(slot)
    return uniq, positions[1:]


class SparseAdamState(NamedTuple):
    m: jnp.ndarray  # (V, D) first moment
    v: jnp.ndarray  # (V, D) second moment


def init_sparse_adam(table: jnp.ndarray) -> SparseAdamState:
    return SparseAdamState(jnp.zeros_like(table), jnp.zeros_like(table))


class SparseAdagradState(NamedTuple):
    """Row-wise Adagrad: ONE fp32 accumulator per row — O(V) optimizer memory
    vs Adam's O(2·V·D) moments (the standard production-embedding trade, used
    by the TPU embedding APIs / DLRM). At D=64 this is ~128× less optimizer
    HBM than dense Adam moments."""

    acc: jnp.ndarray  # (V,) per-row sum of mean-squared gradients


def init_sparse_adagrad(table: jnp.ndarray, initial: float = 0.0) -> SparseAdagradState:
    return SparseAdagradState(
        jnp.full((table.shape[0],), initial, jnp.float32)
    )


def sparse_rowwise_adagrad(
    table: jnp.ndarray,
    opt: SparseAdagradState,
    uniq: jnp.ndarray,  # (U,) sorted unique ids (with pad duplicates)
    grad_rows: jnp.ndarray,  # (U, ...) gradient for those rows
    lr: float,
    eps: float = 1e-10,
) -> Tuple[jnp.ndarray, SparseAdagradState]:
    """Row-wise Adagrad on the touched rows: the accumulator tracks the mean
    squared gradient over each row's D (and field) dims, so every element of
    a row shares one adaptive scale. O(U·D) traffic + O(U) accumulator I/O.
    """
    g32 = grad_rows.astype(jnp.float32)
    reduce_axes = tuple(range(1, g32.ndim))
    g2 = jnp.mean(jnp.square(g32), axis=reduce_axes)  # (U,)
    acc_rows = jnp.take(opt.acc, uniq, axis=0) + g2
    scale = (lr / jnp.sqrt(acc_rows + eps)).reshape(
        (-1,) + (1,) * (g32.ndim - 1)
    )
    rows = jnp.take(table, uniq, axis=0) - (scale * g32).astype(table.dtype)
    return table.at[uniq].set(rows), SparseAdagradState(
        opt.acc.at[uniq].set(acc_rows)
    )


class SparseRowAdamState(NamedTuple):
    """Memory-factored Adam for embedding tables: the first moment is stored
    in bfloat16 (halved HBM) and the second moment is ONE fp32 scalar per row
    (the row-wise Adam used by production embedding systems — every element
    of a row shares an adaptive scale, momentum is kept per element).
    Optimizer memory: 0.5·V·D + V floats vs dense Adam's 2·V·D."""

    m: jnp.ndarray  # (V, D) first moment, bfloat16
    v: jnp.ndarray  # (V,)  per-row mean-squared-gradient EMA, fp32


def init_sparse_row_adam(table: jnp.ndarray) -> SparseRowAdamState:
    return SparseRowAdamState(
        jnp.zeros(table.shape, jnp.bfloat16),
        jnp.zeros((table.shape[0],), jnp.float32),
    )


def sparse_rowwise_adam(
    table: jnp.ndarray,
    opt: SparseRowAdamState,
    uniq: jnp.ndarray,  # (U,) sorted unique ids (with pad duplicates)
    grad_rows: jnp.ndarray,  # (U, ...) gradient for those rows
    step: jnp.ndarray,  # scalar int (1-based for bias correction)
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
) -> Tuple[jnp.ndarray, SparseRowAdamState]:
    """Row-wise Adam on the touched rows: lazy (untouched rows' moments do
    not decay), bias-corrected like Adam, second moment reduced over the
    row's trailing dims. O(U·D) traffic with a bf16 m-gather."""
    g32 = grad_rows.astype(jnp.float32)
    reduce_axes = tuple(range(1, g32.ndim))
    m_rows = jnp.take(opt.m, uniq, axis=0).astype(jnp.float32)
    v_rows = jnp.take(opt.v, uniq, axis=0)
    m_new = b1 * m_rows + (1 - b1) * g32
    v_new = b2 * v_rows + (1 - b2) * jnp.mean(jnp.square(g32), axis=reduce_axes)
    t = step.astype(jnp.float32)
    m_hat = m_new / (1 - b1**t)
    v_hat = (v_new / (1 - b2**t)).reshape((-1,) + (1,) * (g32.ndim - 1))
    delta = lr * m_hat / (jnp.sqrt(v_hat) + eps)
    rows = jnp.take(table, uniq, axis=0) - delta.astype(table.dtype)
    return table.at[uniq].set(rows), SparseRowAdamState(
        opt.m.at[uniq].set(m_new.astype(jnp.bfloat16)),
        opt.v.at[uniq].set(v_new),
    )


def sparse_adam(
    table: jnp.ndarray,
    opt: SparseAdamState,
    uniq: jnp.ndarray,  # (U,) sorted unique ids (with pad duplicates)
    grad_rows: jnp.ndarray,  # (U, D) gradient for those rows
    step: jnp.ndarray,  # scalar int (1-based for bias correction)
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
) -> Tuple[jnp.ndarray, SparseAdamState]:
    """Adam on the touched rows only — O(U·D) gather/compute/scatter.

    Duplicate pad entries in ``uniq`` all scatter into the sacrificial row;
    their garbage moments never affect real rows. Matches dense
    ``optax.adam`` on the touched rows (lazy-Adam semantics: untouched rows'
    moments do not decay — the standard trade for sparse updates).
    """
    m_rows = jnp.take(opt.m, uniq, axis=0)
    v_rows = jnp.take(opt.v, uniq, axis=0)
    # guard duplicates: only the first occurrence of each id carries gradient
    # (autodiff already sums duplicates into the first occurrence because
    # lookup_positions maps every duplicate id to one position)
    m_new = b1 * m_rows + (1 - b1) * grad_rows
    v_new = b2 * v_rows + (1 - b2) * jnp.square(grad_rows)
    t = step.astype(jnp.float32)
    m_hat = m_new / (1 - b1**t)
    v_hat = v_new / (1 - b2**t)
    delta = lr * m_hat / (jnp.sqrt(v_hat) + eps)
    rows = jnp.take(table, uniq, axis=0) - delta.astype(table.dtype)
    new_table = table.at[uniq].set(rows)
    return new_table, SparseAdamState(
        opt.m.at[uniq].set(m_new), opt.v.at[uniq].set(v_new)
    )
