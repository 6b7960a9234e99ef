"""Sharded embedding lookup primitives.

The reference stores every embedding in a single-device
``tf.keras.layers.Embedding`` (e.g. 2.FM/CustomLayers.py:103-106). Here tables
are row-sharded over the mesh 'model' axis; lookup runs under ``shard_map``:

    each model-shard owns rows [shard*V_local, (shard+1)*V_local)
    1. ids are replicated over 'model' (batch stays sharded over 'data')
    2. every shard gathers locally for the ids it owns, zeros elsewhere
    3. one psum over 'model' assembles the full (B, F, D) activation

The backward pass falls out of autodiff: psum^T = identity, masked-take^T =
scatter-add into the local rows only — i.e. gradients land directly on the
owning shard with no extra communication beyond the forward psum's transpose.

For small-to-mid embedding dims (recsys: D = 8..128) the psum pattern beats an
id all-to-all exchange on ICI because the exchanged activation is tiny and the
whole thing fuses into one collective; an all-to-all variant only pays off for
very wide rows. (Design per the scaling-book recipe: pick shardings, let XLA
place collectives.)
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpurec.core.mesh import DATA_AXIS, MODEL_AXIS


def row_sharded_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    model_axis: str = MODEL_AXIS,
    data_axis: Optional[str] = DATA_AXIS,
) -> jnp.ndarray:
    """Gather rows of a row-sharded (V, D) table for (..., ) int ids.

    ``table`` must be sharded P(model_axis, None); ids batch-sharded on
    ``data_axis`` (or replicated if data_axis is None). V must divide evenly
    by the model-axis size (pad the table if needed).
    """
    n_model = mesh.shape[model_axis]
    if table.shape[0] % n_model != 0:
        raise ValueError(
            f"vocab {table.shape[0]} not divisible by model axis {n_model}"
        )
    ids_spec = P(data_axis) if data_axis else P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(model_axis, None), ids_spec),
        out_specs=ids_spec,
    )
    def _lookup(tbl, local_ids):
        shard = jax.lax.axis_index(model_axis)
        v_local = tbl.shape[0]
        local = local_ids - shard * v_local
        ok = (local >= 0) & (local < v_local)
        emb = jnp.take(tbl, jnp.where(ok, local, 0), axis=0)
        emb = jnp.where(ok[..., None], emb, jnp.zeros((), emb.dtype))
        return jax.lax.psum(emb, model_axis)

    return _lookup(table, ids)


def used_id_l2(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum of squared embedding rows over the *unique* ids in the batch.

    Reference semantics: ``tf.unique`` + ``tf.gather`` + ``tf.nn.l2_loss``
    (5.DIN/ModelManager.py:175-190) so regularization only touches embeddings
    actually used this step. ``tf.unique`` is dynamic-shape; here duplicates
    are masked after a sort so the op stays fixed-shape for XLA.
    """
    flat = jnp.sort(ids.reshape(-1))
    first = jnp.concatenate(
        [jnp.ones((1,), bool), flat[1:] != flat[:-1]]
    )
    rows = jnp.take(table, flat, axis=0)
    sq = jnp.sum(rows * rows, axis=-1)
    return 0.5 * jnp.sum(jnp.where(first, sq, 0.0))


@jax.custom_vjp
def contiguous_take(rows: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``jnp.take(rows, ids, axis=0)`` with a scatter-free backward.

    Contract (enforced by the fused trainer's batch rewrite, not checked
    here): for ids reshaped to (B, k), every column j is a contiguous run
    ``ids[:, j] == ids[0, j] + arange(B)``. The VJP then reduces to k
    ``dynamic_update_slice`` writes — XLA's TPU scatter runs at ~7M rows/s
    (latency-bound row loop), which would otherwise dominate every train
    step that embeds O(1e5) ids."""
    return jnp.take(rows, ids, axis=0)


def _ct_fwd(rows, ids):
    return jnp.take(rows, ids, axis=0), (ids, rows.shape)


def _ct_bwd(res, g):
    import numpy as np

    ids, rows_shape = res
    b = ids.shape[0]
    ids2 = ids.reshape(b, -1)  # (B, k) — each column contiguous
    k = ids2.shape[1]
    trailing = rows_shape[1:]
    g2 = g.reshape((b, k) + trailing)
    d = jnp.zeros(rows_shape, g.dtype)
    for j in range(k):
        d = jax.lax.dynamic_update_slice(
            d, g2[:, j], (ids2[0, j],) + (0,) * len(trailing)
        )
    return d, np.zeros(ids.shape, jax.dtypes.float0)


contiguous_take.defvjp(_ct_fwd, _ct_bwd)


def pad_vocab(vocab_size: int, n_model: int, lane: int = 128) -> int:
    """Round vocab up so row-sharding splits evenly and tiles cleanly.

    Always leaves at least one spare row past the real vocab — the sparse
    update engine uses the last row as the sacrificial scatter target for
    padded duplicate ids (tpurec.embedding.sparse.unique_fixed). lane=128:
    a 128-multiple row count makes every (V, D) -> (V·D/128, 128) packed
    view a FREE reshape for power-of-two D (embedding_update.packed_take
    falls back to a plain per-row take otherwise — measured slower on the
    narrow w-table), at a cost of ≤127 spare rows."""
    m = n_model * lane
    return ((vocab_size + 1 + m - 1) // m) * m
