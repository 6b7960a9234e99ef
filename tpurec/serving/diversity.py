"""Aggregate-diversity greedy retrieval (ComiRec inference).

The reference runs ``greedy_search_inference`` / ``greedy_search_inference_parallel``
as ComiRec's serving path (6.MIND/CustomLayers.py:868-963): starting from the
per-interest item scores, iteratively pick the item maximizing
``score + λ·(category novelty)`` so the returned slate trades relevance
against aggregate category coverage.

TPU-native form: the per-user greedy is a ``lax.fori_loop`` over a fixed
(K, N) score grid (static shapes, argmax on the VPU); batches of users run
under ``vmap`` inside one jitted call. λ (``diversity_weight``) is a traced
scalar so one compiled program serves every requested weight.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def greedy_diverse_topk(
    capsule_scores: jnp.ndarray,  # (K, N) per-interest item scores
    item_categories: jnp.ndarray,  # (N,) int category per item
    k: int,
    diversity_weight: float = 0.1,
) -> jnp.ndarray:
    """Single-user greedy (reference greedy_search_inference,
    6.MIND/CustomLayers.py:868-908): returns (k,) item indices."""
    n = capsule_scores.shape[1]
    flat = jnp.max(capsule_scores, axis=0)  # best capsule score per item

    def body(i, carry):
        chosen, chosen_cats, taken = carry
        # an item's category is "seen" if any already-chosen item shares it
        seen = jnp.any(
            item_categories[None, :] == chosen_cats[:, None], axis=0
        )
        objective = flat + diversity_weight * (1.0 - seen.astype(jnp.float32))
        objective = jnp.where(taken, -jnp.inf, objective)
        pick = jnp.argmax(objective)
        chosen = chosen.at[i].set(pick.astype(jnp.int32))
        chosen_cats = chosen_cats.at[i].set(item_categories[pick])
        taken = taken.at[pick].set(True)
        return chosen, chosen_cats, taken

    chosen = jnp.full((k,), -1, jnp.int32)
    chosen_cats = jnp.full((k,), -1, item_categories.dtype)
    taken = jnp.zeros((n,), bool)
    chosen, _, _ = jax.lax.fori_loop(0, k, body, (chosen, chosen_cats, taken))
    return chosen


@functools.partial(jax.jit, static_argnums=(2,))
def _greedy_batch(capsule_scores, item_categories, k, diversity_weight):
    """(B, K, N) scores → ((B, k) indices, (B, k) flat scores)."""

    def one(s):
        idx = greedy_diverse_topk(s, item_categories, k, diversity_weight)
        return idx, jnp.max(s, axis=0)[idx]

    return jax.vmap(one)(capsule_scores)


def diverse_topk(
    user_capsules: np.ndarray,  # (U, K, D) interest capsules or (U, D) vectors
    item_embeddings: np.ndarray,  # (N, D)
    k: int,
    item_categories: np.ndarray,  # (N,) int category ids
    diversity_weight: float = 0.1,
    normalize: bool = True,
    batch_size: int = 1024,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched diversity-greedy retrieval over the full corpus
    (the vectorized form of the reference's greedy_search_inference_parallel,
    6.MIND/CustomLayers.py:911-963). Returns (indices (U, k), scores (U, k));
    scores are the plain (pre-bonus) best-capsule scores of the chosen items,
    cosine if ``normalize``."""

    def _norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    corpus = jnp.asarray(np.asarray(item_embeddings), jnp.float32)
    if normalize:
        corpus = _norm(corpus)
    cats = jnp.asarray(np.asarray(item_categories))
    caps = np.asarray(user_capsules, np.float32)
    if caps.ndim == 2:
        caps = caps[:, None, :]  # single-vector towers: K = 1

    @jax.jit
    def _scores(q):
        q = jnp.asarray(q, jnp.float32)
        if normalize:
            q = _norm(q)
        return jnp.einsum("bkd,nd->bkn", q, corpus)

    all_idx, all_val = [], []
    for start in range(0, len(caps), batch_size):
        chunk = caps[start : start + batch_size]
        pad = 0
        if len(chunk) < batch_size and start > 0:
            pad = batch_size - len(chunk)
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        idx, vals = _greedy_batch(_scores(jnp.asarray(chunk)), cats, k, diversity_weight)
        idx, vals = np.asarray(idx), np.asarray(vals)
        if pad:
            idx, vals = idx[:-pad], vals[:-pad]
        all_idx.append(idx)
        all_val.append(vals)
    return np.concatenate(all_idx), np.concatenate(all_val)
