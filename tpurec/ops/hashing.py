"""Locality-sensitive hashing ops: SimHash codes, Hamming top-k retrieval,
LSH bucketed attention, and SDIM multi-group sketch pooling.

These are the reference's algorithmic long-sequence reducers re-expressed as
fixed-shape XLA ops:
- ETA SimHash + Hamming top-k (7.SIM/CustomLayers.py:498-511, 556-582)
- Reformer-style LSHAttention bucketing (7.SIM/CustomLayers.py:453-515)
- SDIM hash-bucket sketches (8.DMR/CustomLayers.py:816-847)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def simhash_bits(x: jnp.ndarray, projection: jnp.ndarray) -> jnp.ndarray:
    """Sign bits of random projections: (..., D) × (D, n_bits) → (..., n_bits)
    in {0, 1} (reference hash code generation, 7.SIM/CustomLayers.py:556-565)."""
    return (jnp.einsum("...d,db->...b", x, projection) > 0).astype(jnp.int32)


def hamming_similarity(a_bits: jnp.ndarray, b_bits: jnp.ndarray) -> jnp.ndarray:
    """#matching bits between (B, n) query codes and (B, L, n) sequence codes
    → (B, L)."""
    return jnp.sum((a_bits[:, None, :] == b_bits).astype(jnp.int32), axis=-1)


def topk_select(
    scores: jnp.ndarray,  # (B, L) similarity, higher = better
    mask: jnp.ndarray,  # (B, L) 1 = valid
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the top-k valid steps + validity mask of the selection
    (fixed k for XLA; invalid steps rank below everything).
    Reference: soft_index_search argsort+gather (7.SIM/CustomLayers.py:236-260)."""
    neg = jnp.where(mask.astype(bool), scores.astype(jnp.float32), -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(neg, k)
    return top_idx, jnp.isfinite(top_vals).astype(jnp.float32)


def gather_steps(seq: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, k, ...) timesteps from (B, L, ...) by per-sample indices."""
    return jnp.take_along_axis(
        seq, idx.reshape(idx.shape + (1,) * (seq.ndim - 2)), axis=1
    )


def lsh_bucket_ids(
    x: jnp.ndarray,  # (B, L, D)
    projection: jnp.ndarray,  # (D, n_bits)
) -> jnp.ndarray:
    """Bucket id per step = packed SimHash bits → (B, L) ints in [0, 2^n)."""
    bits = simhash_bits(x, projection)
    weights = (2 ** jnp.arange(bits.shape[-1])).astype(jnp.int32)
    return jnp.sum(bits * weights, axis=-1)


def lsh_attention(
    q: jnp.ndarray,  # (B, L, D) (shared QK as in Reformer)
    v: jnp.ndarray,  # (B, L, Dv)
    projection: jnp.ndarray,  # (D, n_bits)
    mask: Optional[jnp.ndarray] = None,  # (B, L)
) -> jnp.ndarray:
    """Bucketed attention: steps attend only within their LSH bucket
    (reference LSHAttention, 7.SIM/CustomLayers.py:453-515). Instead of the
    reference's sort/split, the bucket constraint is a (B, L, L) equality mask
    — O(L²) but fully vectorized and fusable; for the reference's L ≤ O(10³)
    this is the faster TPU form."""
    buckets = lsh_bucket_ids(q, projection)  # (B, L)
    same = buckets[:, :, None] == buckets[:, None, :]
    if mask is not None:
        valid = mask.astype(bool)
        same = same & valid[:, None, :] & valid[:, :, None]
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bld,bmd->blm", q, q).astype(jnp.float32) * scale
    logits = jnp.where(same, logits, -1e9)
    # a step always belongs to its own bucket → softmax is well-defined
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("blm,bmd->bld", w.astype(v.dtype), v)


def sketch_pool(
    seq: jnp.ndarray,  # (B, L, D) behavior embeddings
    mask: jnp.ndarray,  # (B, L)
    projections: jnp.ndarray,  # (G, D, n_bits) one per hash group
    query: jnp.ndarray,  # (B, D) target embedding
) -> jnp.ndarray:
    """SDIM multi-group sketch pooling: per hash group, mean-pool the behavior
    steps that collide with the target's bucket; average over groups
    (reference one-hot/einsum sketches, 8.DMR/CustomLayers.py:819-841).
    Returns (B, D)."""
    g = projections.shape[0]

    def one_group(proj):
        seq_b = lsh_bucket_ids(seq, proj)  # (B, L)
        q_bits = simhash_bits(query, proj)
        weights = (2 ** jnp.arange(q_bits.shape[-1])).astype(jnp.int32)
        q_b = jnp.sum(q_bits * weights, axis=-1)  # (B,)
        hit = (seq_b == q_b[:, None]).astype(jnp.float32) * mask
        denom = jnp.maximum(jnp.sum(hit, axis=-1, keepdims=True), 1.0)
        return jnp.einsum("bl,bld->bd", (hit / denom).astype(seq.dtype), seq)

    pooled = jax.vmap(one_group)(projections)  # (G, B, D)
    return jnp.mean(pooled, axis=0)


def make_projections(key, num_groups: int, dim: int, n_bits: int) -> jnp.ndarray:
    return jax.random.normal(key, (num_groups, dim, n_bits), jnp.float32)
