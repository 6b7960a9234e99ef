"""Offline retrieval indexing: embedding dump → exact top-k → KV store.

TPU-native replacement for the reference OfflineLoader (SURVEY §3.3,
2.FM/OfflineLoader.py:177-183): tower inference batches all user/item
profiles, and the sklearn BallTree (:129-146) is replaced by an exact
normalized-matmul top-k on device — at recsys corpus sizes (10⁴–10⁷ items)
one (U_batch, D)×(D, N) matmul on the MXU beats any tree traversal, and it's
exact. Artifacts keep the reference contract:

- ``ebd_result/user_embedding.json`` / ``item_embedding.json``
- per-user ``<prefix>_<uid> → "i1,i2,...\\ts1,s2,..."`` strings in the KV store
  (reference Redis value format, 2.FM/OfflineLoader.py:155-160)
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpurec.serving.kvstore import DictKVStore


def exact_topk(
    queries: jnp.ndarray,  # (Q, D)
    corpus: jnp.ndarray,  # (N, D)
    k: int,
    normalize: bool = True,
    batch_size: int = 4096,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact cosine/inner-product top-k via jitted matmul + lax.top_k.
    Returns (indices (Q, k), scores (Q, k))."""

    def _norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    corpus = jnp.asarray(corpus, jnp.float32)
    if normalize:
        corpus = _norm(corpus)

    @jax.jit
    def _topk(q):
        q = jnp.asarray(q, jnp.float32)
        if normalize:
            q = _norm(q)
        scores = q @ corpus.T
        vals, idx = jax.lax.top_k(scores, k)
        return idx, vals

    all_idx: List[np.ndarray] = []
    all_val: List[np.ndarray] = []
    queries = np.asarray(queries)
    for start in range(0, len(queries), batch_size):
        chunk = queries[start : start + batch_size]
        pad = 0
        if len(chunk) < batch_size and start > 0:
            pad = batch_size - len(chunk)
            chunk = np.concatenate([chunk, np.zeros((pad, chunk.shape[1]), chunk.dtype)])
        idx, vals = _topk(jnp.asarray(chunk))
        idx, vals = np.asarray(idx), np.asarray(vals)
        if pad:
            idx, vals = idx[:-pad], vals[:-pad]
        all_idx.append(idx)
        all_val.append(vals)
    return np.concatenate(all_idx), np.concatenate(all_val)


def recall_at_k(
    user_emb: np.ndarray,
    item_emb: np.ndarray,
    truth: Sequence[int],
    k: int = 100,
) -> float:
    """Fraction of users whose true item appears in their exact top-k
    (the retrieval metric the reference never reports — BASELINE.md)."""
    idx, _ = exact_topk(user_emb, item_emb, k)
    truth = np.asarray(truth)
    return float(np.mean(np.any(idx == truth[:, None], axis=1)))


class OfflineIndexer:
    """Dump tower embeddings for every profile entry, build the top-k lists,
    persist artifacts (reference run(): 2.FM/OfflineLoader.py:177-183)."""

    def __init__(
        self,
        user_tower,  # callable: dict inputs -> (B, D) embeddings
        item_tower,
        user_profile: Dict[str, List[int]],  # uid → encoded feature ids
        item_profile: Dict[str, List[int]],
        user_feature_names: Sequence[str],
        item_feature_names: Sequence[str],
        batch_size: int = 1024,
    ):
        self.user_tower = user_tower
        self.item_tower = item_tower
        self.user_profile = user_profile
        self.item_profile = item_profile
        self.user_feature_names = list(user_feature_names)
        self.item_feature_names = list(item_feature_names)
        self.batch_size = batch_size

    def _embed_all(self, tower, profile, feature_names) -> Tuple[List[str], np.ndarray]:
        ids = list(profile.keys())
        rows = [profile[i] for i in ids]
        # columnwise so a feature may be a scalar id OR a sequence (e.g. a
        # stored behavior history for multi-interest user towers)
        cols = [
            np.asarray([r[j] for r in rows], np.int64)
            for j in range(len(feature_names))
        ]
        out: List[np.ndarray] = []
        bs = self.batch_size
        for start in range(0, len(ids), bs):
            chunks = [c[start : start + bs] for c in cols]
            n = len(chunks[0])
            pad = bs - n if start > 0 and n < bs else 0
            if pad:
                chunks = [
                    np.concatenate([c, np.tile(c[-1:], (pad,) + (1,) * (c.ndim - 1))])
                    for c in chunks
                ]
            batch = {
                name: jnp.asarray(chunks[j]) for j, name in enumerate(feature_names)
            }
            emb = np.asarray(tower(batch))
            if pad:
                emb = emb[:-pad]
            out.append(emb)
        return ids, np.concatenate(out)

    def run(
        self,
        output_dir: str,
        kv_store: Optional[DictKVStore] = None,
        topk: int = 20,
        key_prefix: str = "DSSM",
        item_categories: Optional[Sequence[int]] = None,
        diversity_weight: float = 0.0,
    ) -> Dict[str, object]:
        """``diversity_weight > 0`` (with per-item ``item_categories``)
        precomputes ComiRec's diversity-greedy slates instead of plain top-k
        (reference greedy_search_inference, 6.MIND/CustomLayers.py:868-963);
        multi-interest user towers returning (B, K, D) capsules are scored by
        their best capsule either way."""
        user_ids, user_emb = self._embed_all(
            self.user_tower, self.user_profile, self.user_feature_names
        )
        item_ids, item_emb = self._embed_all(
            self.item_tower, self.item_profile, self.item_feature_names
        )
        ebd_dir = os.path.join(output_dir, "ebd_result")
        os.makedirs(ebd_dir, exist_ok=True)
        with open(os.path.join(ebd_dir, "user_embedding.json"), "w") as f:
            json.dump({u: e.tolist() for u, e in zip(user_ids, user_emb)}, f)
        with open(os.path.join(ebd_dir, "item_embedding.json"), "w") as f:
            json.dump({i: e.tolist() for i, e in zip(item_ids, item_emb)}, f)
        k = min(topk, len(item_ids))
        if user_emb.ndim == 3 or diversity_weight > 0.0:
            from tpurec.serving.diversity import diverse_topk

            cats = (
                np.asarray(item_categories)
                if item_categories is not None
                else np.zeros(len(item_ids), np.int32)
            )
            idx, scores = diverse_topk(
                user_emb, item_emb, k, cats, diversity_weight
            )
        else:
            idx, scores = exact_topk(user_emb, item_emb, k)
        kv = kv_store if kv_store is not None else DictKVStore()
        for row, uid in enumerate(user_ids):
            items = ",".join(item_ids[j] for j in idx[row])
            svals = ",".join(f"{s:.6f}" for s in scores[row])
            kv.set(f"{key_prefix}_{uid}", items + "\t" + svals)
        np.savez(
            os.path.join(output_dir, "topk_index.npz"),
            user_ids=np.asarray(user_ids),
            item_ids=np.asarray(item_ids),
            item_embeddings=item_emb,
            user_embeddings=user_emb,
        )
        return {
            "num_users": len(user_ids),
            "num_items": len(item_ids),
            "kv": kv,
            "user_embeddings": user_emb,
            "item_embeddings": item_emb,
            "user_ids": user_ids,
            "item_ids": item_ids,
        }
