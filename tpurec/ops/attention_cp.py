"""Context-parallel (sequence-sharded) attention hooks.

SURVEY §2.10: the reference's long-history models shrink the sequence
algorithmically (SIM top-k, ETA SimHash, SDIM sketches) on one device; the
TPU-native escape hatch for histories that outgrow one chip is to shard the
SEQUENCE dimension over the 'model' mesh axis and reduce with XLA
collectives over ICI. At recsys lengths (≤ O(10⁴)) a single all-reduce
beats a ring schedule, so these are flash-style two-pass formulations under
``shard_map`` rather than ring attention:

- ``din_attention_cp`` — the DIN activation-unit attention
  (5.DIN/CustomLayers.py:163-180,270): scores are unnormalized, so each
  shard pools its local steps and one psum finishes the sum-pool.
- ``softmax_attention_cp`` — masked scaled-dot attention (the DIEN/ETA/MHA
  pooling pattern): global max via pmax, then psum of the exp-weighted
  numerator and denominator.

Both wrap the single-device math (the fused Pallas kernel where available)
per shard, so CP composes with the kernel surface.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpurec.core.mesh import MODEL_AXIS


def din_attention_cp(
    query: jnp.ndarray,  # (B, D) replicated over the CP axis
    keys: jnp.ndarray,  # (B, L, D) — L sharded over `axis`
    mask: jnp.ndarray,  # (B, L)
    w1: jnp.ndarray,  # (4D, H)
    b1: jnp.ndarray,  # (H,)
    w2: jnp.ndarray,  # (H,)
    alpha: Optional[jnp.ndarray],  # (H,) or None
    mesh: Mesh,
    axis: str = MODEL_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence-sharded DIN target attention. Each device runs the fused
    kernel on its L/n_axis slice; the masked score·key sum-pool is finished
    by ONE psum over the axis. Returns (pooled (B, D), scores (B, L) —
    scores stay sequence-sharded like the input)."""
    from tpurec.ops.pallas.kernels import (
        din_attention_fused,
        din_attention_reference,
        pallas_available,
    )

    local = din_attention_fused if pallas_available() else din_attention_reference
    alpha_in = alpha if alpha is not None else jnp.zeros((w1.shape[1],), jnp.float32)

    def shard_fn(q, k, m, w1_, b1_, w2_, al):
        pooled, scores = local(q, k, m, w1_, b1_, w2_, al)
        return jax.lax.psum(pooled, axis), scores

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(), P(None, axis, None), P(None, axis), P(), P(), P(), P(),
        ),
        out_specs=(P(), P(None, axis)),
    )(query, keys, mask, w1, b1, w2, alpha_in)


def softmax_attention_cp(
    query: jnp.ndarray,  # (B, D)
    keys: jnp.ndarray,  # (B, L, D) — L sharded over `axis`
    values: jnp.ndarray,  # (B, L, Dv) — L sharded over `axis`
    mask: jnp.ndarray,  # (B, L)
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Sequence-sharded masked softmax attention pooling (one query per row —
    the DIEN/ETA/SDM user-query pattern). Flash-style two-pass across
    shards: pmax for the global max, psum for the exp-weighted numerator and
    denominator. Returns (B, Dv)."""
    d = keys.shape[-1]
    s = scale if scale is not None else 1.0 / float(d) ** 0.5

    def shard_fn(q, k, v, m):
        logits = jnp.einsum(
            "bd,bld->bl", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * s
        logits = jnp.where(m.astype(bool), logits, -jnp.inf)
        local_max = jnp.max(logits, axis=-1)
        gmax = jax.lax.pmax(local_max, axis)
        # rows with no valid step anywhere: keep exp finite, zero numerator
        gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
        w = jnp.where(m.astype(bool), jnp.exp(logits - gmax[:, None]), 0.0)
        num = jax.lax.psum(
            jnp.einsum("bl,bld->bd", w, v.astype(jnp.float32)), axis
        )
        den = jax.lax.psum(jnp.sum(w, axis=-1), axis)
        return (num / jnp.maximum(den, 1e-9)[:, None]).astype(values.dtype)

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None), P(None, axis)),
        out_specs=P(),
    )(query, keys, values, mask)
