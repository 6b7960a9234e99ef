"""Multi-interest retrieval family: MIND, SDM, ComiRec (DR & SA), SINE
(chapter 6 of the reference, 6.MIND/CustomLayers.py).

All models map a behavior history (+ profile) to one or more user interest
vectors and score candidate items by inner product; training uses the
in-batch softmax loss (tpurec.train.losses.in_batch_softmax — the reference's
first-column-positive convention, 6.MIND/CustomLayers.py:252-261). Outputs
expose 'user_embedding' / 'item_embedding' (and 'interest_capsules' where
applicable) for the offline indexer.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from tpurec.embedding.modules import SharedEmbedding
from tpurec.models.base import Inputs, Outputs, sequence_mask, stack_ids
from tpurec.ops.attention import MultiHeadAttention, scaled_dot_attention, expand_mask
from tpurec.ops.capsule import CapsuleRouting, LabelAwareAttention
from tpurec.ops.mlp import MLP
from tpurec.ops.sequence import MaskedGRU, sinusoidal_positions


class _RetrievalBase(nn.Module):
    user_features: Sequence[str]
    sequence_features: Sequence[str]
    item_key: str = "item_id"
    vocab_size: int = 0
    embed_dim: int = 16
    padding_index: int = 0
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    def _embedding(self):
        return SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )

    def _behavior(self, emb, inputs):
        seq = inputs[self.sequence_features[0]]
        return emb(seq), sequence_mask(seq, self.padding_index)

    def _profile_vec(self, emb, inputs):
        if not self.user_features:
            return None
        e = emb(stack_ids(inputs, list(self.user_features)))
        return e.reshape(e.shape[0], -1)


class MIND(_RetrievalBase):
    """Multi-interest network with dynamic routing (reference MINDLayer,
    6.MIND/CustomLayers.py:161-285): capsule routing over the behavior
    sequence, profile-MLP concat, label-aware attention → user vector."""

    num_interests: int = 4
    hidden_dims: Sequence[int] = (64,)
    attention_power: float = 2.0

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self._embedding()
        behavior, mask = self._behavior(emb, inputs)
        capsules, cap_mask = CapsuleRouting(
            self.num_interests, self.embed_dim, mode="shared", dtype=self.dtype, name="routing"
        )(behavior, mask)
        profile = self._profile_vec(emb, inputs)
        if profile is not None:
            b, k, d = capsules.shape
            prof = jnp.broadcast_to(profile[:, None, :], (b, k, profile.shape[-1]))
            merged = jnp.concatenate([capsules, prof], axis=-1)
            capsules = MLP(
                tuple(self.hidden_dims) + (self.embed_dim,),
                out_activation="linear", dtype=self.dtype, name="capsule_mlp",
            )(merged, train=train)
        target = emb(inputs[self.item_key].reshape(-1))
        user_vec = LabelAwareAttention(self.attention_power, name="label_att")(
            capsules, cap_mask, target
        )
        return {
            "user_embedding": user_vec,
            "item_embedding": target,
            "interest_capsules": capsules,
            "capsule_mask": cap_mask,
            "output": jnp.sum(
                user_vec.astype(jnp.float32) * target.astype(jnp.float32), axis=-1
            ),
        }


class SDM(_RetrievalBase):
    """Sequential deep matching (reference SDMLayer,
    6.MIND/CustomLayers.py:430-525): short-term channel = stacked LSTM-like
    recurrence + self-MHA + user-query attention over the recent window;
    long-term channel = per-feature user-query attention; fusion gate."""

    short_len: int = 10  # last N steps form the short-term window
    num_heads: int = 2
    hidden_dims: Sequence[int] = (64,)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self._embedding()
        behavior, mask = self._behavior(emb, inputs)
        d = behavior.shape[-1]
        profile = self._profile_vec(emb, inputs)
        user_q = nn.Dense(d, dtype=self.dtype, name="user_proj")(profile)  # (B, D)
        # short-term: most recent steps (history is stored oldest→newest;
        # padding sits at the tail, so take a learned attention over the
        # masked recurrent states of the last short_len *valid* steps —
        # implemented as recurrence over the full sequence + window mask)
        states = MaskedGRU(d, dtype=self.dtype, name="short_rnn")(behavior, mask)
        states = MultiHeadAttention(
            self.num_heads, max(1, d // self.num_heads), dtype=self.dtype, name="short_mha"
        )(states, mask=mask, train=train)
        # user-query attention pooling (reference AttnNet :288-308)
        def attn_pool(x, m, name):
            logits = jnp.einsum("bld,bd->bl", x.astype(jnp.float32), user_q.astype(jnp.float32))
            logits = jnp.where(m.astype(bool), logits, -1e9)
            w = jax.nn.softmax(logits, axis=-1) * (jnp.sum(m, -1, keepdims=True) > 0)
            return jnp.einsum("bl,bld->bd", w.astype(x.dtype), x)

        # short window mask: last short_len valid positions
        idx = jnp.arange(mask.shape[1])[None, :]
        lengths = jnp.sum(mask, axis=-1, keepdims=True)
        short_mask = mask * (idx >= (lengths - self.short_len)).astype(mask.dtype)
        s_t = attn_pool(states, short_mask, "short")
        p_t = attn_pool(behavior, mask, "long")  # long-term over raw embeddings
        p_t = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="long_proj")(p_t))
        gate = nn.sigmoid(
            nn.Dense(d, dtype=self.dtype, name="gate")(
                jnp.concatenate([user_q, s_t, p_t], axis=-1)
            )
        )
        user_vec = gate * p_t + (1.0 - gate) * s_t
        target = emb(inputs[self.item_key].reshape(-1))
        return {
            "user_embedding": user_vec,
            "item_embedding": target,
            "output": jnp.sum(
                user_vec.astype(jnp.float32) * target.astype(jnp.float32), axis=-1
            ),
        }


class ComiRec(_RetrievalBase):
    """Controllable multi-interest retrieval (reference ComiRecLayer,
    6.MIND/CustomLayers.py:668-963). variant 'dr' = dynamic routing with
    per-position weights (:528-594); 'sa' = self-attentive capsules with
    sinusoidal positions (:597-665). Training picks the capsule with max
    inner product against the target (:788-806)."""

    variant: str = "sa"
    num_interests: int = 4
    attention_dim: int = 32
    max_seq_length: int = 0
    # >0: 'auto' training mode — sampled softmax over [positive ∥ N sampled
    # negative item ids] (reference tf.nn.sampled_softmax_loss over the id
    # table, 6.MIND/CustomLayers.py:853-863); emits 'logits' with the
    # first-column-positive convention consumed by losses.in_batch_softmax
    num_sampled_negatives: int = 0

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self._embedding()
        behavior, mask = self._behavior(emb, inputs)
        b, l, d = behavior.shape
        if self.variant == "dr":
            capsules, cap_mask = CapsuleRouting(
                self.num_interests, d, mode="per_pos", max_length=l,
                dtype=self.dtype, name="routing",
            )(behavior, mask)
        else:
            pos = jnp.asarray(sinusoidal_positions(l, d))
            h = behavior + pos[None].astype(behavior.dtype)
            a = jnp.tanh(nn.Dense(self.attention_dim, use_bias=False, dtype=self.dtype, name="w1")(h))
            a = nn.Dense(self.num_interests, use_bias=False, dtype=self.dtype, name="w2")(a)
            a = jnp.where(mask[:, :, None].astype(bool), a.astype(jnp.float32), -1e9)
            a = jax.nn.softmax(a, axis=1)  # (B, L, K)
            capsules = jnp.einsum("blk,bld->bkd", a.astype(behavior.dtype), behavior)
            cap_mask = jnp.ones((b, self.num_interests), jnp.float32)
        target = emb(inputs[self.item_key].reshape(-1))
        # hard capsule selection by inner product with the target
        scores = jnp.einsum(
            "bkd,bd->bk", capsules.astype(jnp.float32), target.astype(jnp.float32)
        )
        scores = jnp.where(cap_mask.astype(bool), scores, -1e9)
        best = jnp.argmax(scores, axis=-1)
        user_vec = jnp.take_along_axis(capsules, best[:, None, None], axis=1)[:, 0]
        out: Outputs = {
            "user_embedding": user_vec,
            "item_embedding": target,
            "interest_capsules": capsules,
            "capsule_mask": cap_mask,
            "output": jnp.max(scores, axis=-1),
        }
        if train and self.num_sampled_negatives > 0:
            neg_ids = jax.random.randint(
                self.make_rng("sampling"),
                (b, self.num_sampled_negatives),
                1,  # skip the padding id
                self.vocab_size,
            )
            neg_emb = emb(neg_ids)  # (B, N, D)
            pos_logit = jnp.einsum(
                "bd,bd->b", user_vec.astype(jnp.float32), target.astype(jnp.float32)
            )[:, None]
            neg_logits = jnp.einsum(
                "bd,bnd->bn", user_vec.astype(jnp.float32), neg_emb.astype(jnp.float32)
            )
            out["logits"] = jnp.concatenate([pos_logit, neg_logits], axis=-1)
        return out


def greedy_diverse_topk(
    capsule_scores: jnp.ndarray,  # (K, N) per-interest item scores
    item_categories: jnp.ndarray,  # (N,) int category per item
    k: int,
    diversity_weight: float = 0.1,
) -> jnp.ndarray:
    """ComiRec aggregate-diversity greedy inference
    (reference greedy_search_inference / _parallel,
    6.MIND/CustomLayers.py:868-963): iteratively pick the item maximizing
    score + λ·(category novelty). Vectorized over a fixed K·N score grid with
    a lax.fori loop; returns (k,) item indices."""
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


class SINE(_RetrievalBase):
    """Sparse interest network (reference SINELayer,
    6.MIND/CustomLayers.py:966-1176): a global interest pool (P, D); per user
    the top-K pool prototypes activate (:1024-1053); intention assignment
    distributes behavior steps over the active prototypes (:1055-1091);
    per-prototype interest vectors are aggregated with a tau-softmax against a
    predicted next-intention vector (:1093-1130). Covariance regularization
    on the pool is returned as 'auxiliary_loss' (:1143-1157)."""

    pool_size: int = 32
    num_active: int = 4
    tau: float = 0.1
    cov_weight: float = 0.01

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self._embedding()
        behavior, mask = self._behavior(emb, inputs)
        b, l, d = behavior.shape
        pool = self.param(
            "interest_pool", nn.initializers.glorot_uniform(), (self.pool_size, d), jnp.float32
        ).astype(behavior.dtype)
        # user summary = masked mean + self-attention pooling
        w_mask = mask[..., None].astype(behavior.dtype)
        summary = jnp.sum(behavior * w_mask, axis=1) / jnp.maximum(jnp.sum(w_mask, 1), 1.0)
        # top-K prototype activation per user (straight-through top-k mask)
        act = jnp.einsum("bd,pd->bp", summary.astype(jnp.float32), pool.astype(jnp.float32))
        topk_val, topk_idx = jax.lax.top_k(act, self.num_active)
        active = jnp.take(pool, topk_idx, axis=0)  # (B, K, D)
        gate = nn.sigmoid(topk_val)[..., None].astype(active.dtype)
        active = active * gate
        # intention assignment: each behavior step → distribution over active prototypes
        assign = jnp.einsum("bld,bkd->blk", behavior.astype(jnp.float32), active.astype(jnp.float32))
        assign = jnp.where(mask[:, :, None].astype(bool), assign, -1e9)
        p_lk = jax.nn.softmax(assign, axis=-1)
        # attention weight of each step within its prototype
        attn = jax.nn.softmax(jnp.where(mask.astype(bool),
                                        jnp.einsum("bld,bd->bl", behavior.astype(jnp.float32), summary.astype(jnp.float32)),
                                        -1e9), axis=-1)
        w_blk = (p_lk * attn[:, :, None] * mask[:, :, None]).astype(behavior.dtype)
        interests = jnp.einsum("blk,bld->bkd", w_blk, behavior)  # (B, K, D)
        interests = interests / (
            jnp.linalg.norm(interests.astype(jnp.float32), axis=-1, keepdims=True) + 1e-8
        ).astype(interests.dtype)
        # next-intention prediction and tau-softmax aggregation
        c_apt = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="intent_proj")(summary))
        agg = jnp.einsum("bkd,bd->bk", interests.astype(jnp.float32), c_apt.astype(jnp.float32))
        e_k = jax.nn.softmax(agg / self.tau, axis=-1)
        user_vec = jnp.einsum("bk,bkd->bd", e_k.astype(interests.dtype), interests)
        target = emb(inputs[self.item_key].reshape(-1))
        out: Outputs = {
            "user_embedding": user_vec,
            "item_embedding": target,
            "interest_capsules": interests,
            "output": jnp.sum(
                user_vec.astype(jnp.float32) * target.astype(jnp.float32), axis=-1
            ),
        }
        if train and self.cov_weight > 0:
            p = pool.astype(jnp.float32)
            p = p - jnp.mean(p, axis=0, keepdims=True)
            cov = (p.T @ p) / self.pool_size
            off_diag = cov - jnp.diag(jnp.diag(cov))
            out["auxiliary_loss"] = self.cov_weight * 0.5 * jnp.sum(jnp.square(off_diag))
        return out
