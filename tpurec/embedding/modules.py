"""Flax embedding modules over the shared offset-encoded id space.

One ``SharedEmbedding`` instance replaces the per-chapter
``tf.keras.layers.Embedding(feature_values_cnt, dim)`` of the reference
(e.g. 2.FM/CustomLayers.py:103-106): every categorical feature indexes the
same table via its global offset id. Parameters carry mesh-axis partitioning
metadata (rows over 'model') so the trainer can derive shardings with
``nn.get_partition_spec``; lookup optionally routes through the explicit
``shard_map`` path in tpurec.embedding.ops.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from tpurec.core.mesh import MODEL_AXIS
from tpurec.embedding.ops import (
    contiguous_take,
    pad_vocab,
    row_sharded_lookup,
    used_id_l2,
)


# ---------------------------------------------------------------------------
# sparse-update mode (see tpurec/embedding/sparse.py).
#
# A process-level flag read at TRACE time: when the trainer enables sparse
# mode before tracing its train/eval steps, SharedEmbedding stores its table
# in the 'tables' collection (outside the optimizer's params) and, when the
# trainer supplies the per-step 'sparse_ids'/'sparse_rows' collections,
# resolves ids against the gathered rows so no table-shaped gradient ever
# exists. Outside sparse mode nothing changes.
_SPARSE_MODE = False
# row layout of the trainer-provided 'sparse_rows' collection:
#   'unique' — rows are the batch's sorted unique ids; batch columns were
#              rewritten to slots (duplicates share one slot)
#   'direct' — one row per id OCCURRENCE in trainer concat order; batch
#              columns were rewritten to identity arange slices, so lookups
#              use contiguous_take (scatter-free backward)
_SPARSE_LAYOUT = "unique"


def set_sparse_mode(enabled: bool) -> None:
    global _SPARSE_MODE
    _SPARSE_MODE = enabled


def sparse_mode_enabled() -> bool:
    return _SPARSE_MODE


def set_sparse_layout(layout: str) -> None:
    assert layout in ("unique", "direct"), layout
    global _SPARSE_LAYOUT
    _SPARSE_LAYOUT = layout


# Trace-time flag: route DENSE-path lookups through the free (V/k, 128)
# packed view (tpurec.ops.pallas.embedding_update.packed_take) — the forward
# gather reads a k-times-smaller source and the autodiff backward scatters
# into k-times-fewer destination rows (XLA's TPU gather/scatter are
# latency-bound per ROW). Single-model-axis only: the packed reshape does not
# commute with row sharding. Measured A/B: benchmarks/engine_ab_results.json
# dense_packed rows.
_DENSE_PACKED_GATHER = False


def set_dense_packed_gather(enabled: bool) -> None:
    global _DENSE_PACKED_GATHER
    _DENSE_PACKED_GATHER = enabled


def dense_packed_gather_enabled() -> bool:
    return _DENSE_PACKED_GATHER


def sparse_layout() -> str:
    return _SPARSE_LAYOUT


def uniform_init(scale: float):
    """Keras-Embedding-style RandomUniform(-scale, scale) (reference parity)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class SharedEmbedding(nn.Module):
    """(V, D) table, rows sharded over the 'model' mesh axis.

    strategy:
      'gspmd'     — plain take; XLA GSPMD partitions the gather from the
                    param's sharding annotation (default)
      'shard_map' — explicit mask+psum lookup (tpurec.embedding.ops); requires
                    ``mesh``
    """

    vocab_size: int
    dim: int
    init_scale: float = 0.05
    param_dtype: Any = jnp.float32
    dtype: Optional[Any] = None  # output/compute dtype; None = param dtype
    strategy: str = "gspmd"
    mesh: Optional[Mesh] = None
    name_suffix: str = ""

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        n_model = self.mesh.shape[MODEL_AXIS] if self.mesh is not None else 1
        v_pad = pad_vocab(self.vocab_size, n_model)
        if sparse_mode_enabled():
            # same ('model', None) row-sharding metadata as the dense param:
            # the trainer's init_state places the table with its NamedSharding
            # (sparse gather/scatter then run under GSPMD with the collectives
            # XLA inserts)
            table_var = self.variable(
                "tables",
                "embedding" + self.name_suffix,
                nn.with_partitioning(
                    uniform_init(self.init_scale), (MODEL_AXIS, None)
                ),
                self.make_rng("params") if self.has_rng("params") else None,
                (v_pad, self.dim),
                self.param_dtype,
            )
            table = table_var.value
            if self.has_variable("sparse_rows", "embedding" + self.name_suffix):
                # trainer-provided gathered-row path: O(U·D), no dense grads.
                # Trainer contract: the batch's id features were rewritten
                # into ROW POSITIONS within `rows` (tpurec.embedding.sparse.
                # unique_with_positions), so `ids` here already index rows
                # directly — no per-module position search.
                rows = self.get_variable(
                    "sparse_rows", "embedding" + self.name_suffix
                )
                if sparse_layout() == "direct":
                    # identity-position layout: scatter-free backward; the
                    # trainer computes used-id L2 itself (needs the global
                    # first-occurrence mask)
                    out = contiguous_take(jnp.asarray(rows), ids)
                    if self.dtype is not None:
                        out = out.astype(self.dtype)
                    return out
                out = jnp.take(rows, ids, axis=0)
                if self.is_mutable_collection("regularization"):
                    # used-id L2 over the gathered rows (grads flow to rows)
                    self.sow(
                        "regularization",
                        "used_id_l2",
                        used_id_l2(jnp.asarray(rows), ids),
                        init_fn=lambda: jnp.zeros((), jnp.float32),
                        reduce_fn=lambda a, b: a + b,
                    )
            else:  # eval / serving: plain dense gather from the state table
                out = jnp.take(table, ids, axis=0)
            if self.dtype is not None:
                out = out.astype(self.dtype)
            return out
        table = self.param(
            "embedding" + self.name_suffix,
            nn.with_partitioning(uniform_init(self.init_scale), (MODEL_AXIS, None)),
            (v_pad, self.dim),
            self.param_dtype,
        )
        if self.strategy == "shard_map" and self.mesh is not None and n_model > 1:
            out = row_sharded_lookup(table, ids, self.mesh)
        elif dense_packed_gather_enabled() and n_model == 1:
            from tpurec.ops.pallas.embedding_update import packed_take

            out = packed_take(table, ids.reshape(-1)).reshape(
                ids.shape + (self.dim,)
            )
        else:
            out = jnp.take(table, ids, axis=0)
        if self.is_mutable_collection("regularization"):
            # per-batch used-id L2 (reference: 5.DIN/ModelManager.py:175-190);
            # the trainer reads this collection and scales by the configured
            # coefficient. Computed on the fp32 table.
            self.sow(
                "regularization",
                "used_id_l2",
                used_id_l2(jnp.asarray(table), ids),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=lambda a, b: a + b,
            )
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return out


class LinearEmbedding(nn.Module):
    """(V, 1) order-1 weight table (the FM 'w-embedding',
    2.FM/CustomLayers.py:103-117). Returns (..., ) scores (last dim squeezed)."""

    vocab_size: int
    init_scale: float = 0.05
    param_dtype: Any = jnp.float32
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        emb = SharedEmbedding(
            vocab_size=self.vocab_size,
            dim=1,
            init_scale=self.init_scale,
            param_dtype=self.param_dtype,
            dtype=self.dtype,
            mesh=self.mesh,
            name="w",
        )(ids)
        return jnp.squeeze(emb, axis=-1)


class FieldAwareEmbedding(nn.Module):
    """(V, F, D) field-aware table: one embedding per (id, target-field) pair,
    the vectorized FFM/ONN layout (reference: one (values, fields, D) table at
    2.FM/CustomLayers.py:428-462). Rows sharded over 'model'."""

    vocab_size: int
    num_fields: int
    dim: int
    init_scale: float = 0.05
    param_dtype: Any = jnp.float32
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        n_model = self.mesh.shape[MODEL_AXIS] if self.mesh is not None else 1
        v_pad = pad_vocab(self.vocab_size, n_model)
        if sparse_mode_enabled():
            # same contract as SharedEmbedding's sparse branch: the (V, F, D)
            # table lives in 'tables' (outside optax); when the trainer
            # supplies gathered rows (batch ids already rewritten to row
            # positions) the lookup touches only (U, F, D).
            table_var = self.variable(
                "tables",
                "embedding",
                nn.with_partitioning(
                    uniform_init(self.init_scale), (MODEL_AXIS, None, None)
                ),
                self.make_rng("params") if self.has_rng("params") else None,
                (v_pad, self.num_fields, self.dim),
                self.param_dtype,
            )
            if self.has_variable("sparse_rows", "embedding"):
                rows = self.get_variable("sparse_rows", "embedding")
                if sparse_layout() == "direct":
                    out = contiguous_take(jnp.asarray(rows), ids)
                else:
                    out = jnp.take(rows, ids, axis=0)
            else:  # eval / serving
                out = jnp.take(table_var.value, ids, axis=0)
            if self.dtype is not None:
                out = out.astype(self.dtype)
            return out
        table = self.param(
            "embedding",
            nn.with_partitioning(uniform_init(self.init_scale), (MODEL_AXIS, None, None)),
            (v_pad, self.num_fields, self.dim),
            self.param_dtype,
        )
        out = jnp.take(table, ids, axis=0)  # (..., F, D)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return out


def stack_features(inputs, names) -> jnp.ndarray:
    """Stack scalar categorical features into one (B, F) id tensor.

    Models consume a dict of per-feature (B,) int arrays (same contract as the
    reference layers' input dicts, e.g. 2.FM/CustomLayers.py:127-133) and
    stack the fields they use.
    """
    return jnp.stack([inputs[n].reshape(-1) for n in names], axis=1)
