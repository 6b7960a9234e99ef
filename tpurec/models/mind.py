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
from tpurec.models.base import Inputs, Outputs, embed_series, sequence_mask, stack_ids
from tpurec.ops.attention import MultiHeadAttention, scaled_dot_attention, expand_mask
from tpurec.ops.capsule import CapsuleRouting, LabelAwareAttention
from tpurec.ops.mlp import MLP
from tpurec.ops.sequence import MaskedGRU, MaskedLSTM, sinusoidal_positions


class _RetrievalBase(nn.Module):
    user_features: Sequence[str]
    sequence_features: Sequence[str]
    # candidate features aligned 1:1 with sequence_features so the target item
    # embeds into the same (F·D) space as each behavior step (reference pairs
    # item_categorical_features with behavior_series_features,
    # 6.MIND/CustomLayers.py:162-172)
    query_features: Sequence[str] = ("item_id",)
    vocab_size: int = 0
    embed_dim: int = 16
    padding_index: int = 0
    # >0: sampled-softmax training — logits over [positive ∥ N uniformly
    # sampled negative items] (the reference's tf.nn.sampled_softmax_loss
    # over the id table, 6.MIND/CustomLayers.py:853-863); emits 'logits' with
    # the first-column-positive convention of losses.in_batch_softmax.
    # Negatives are sampled PER QUERY FEATURE within that feature's offset
    # range (query_feature_ranges, wired from DataInfo by the builder) so a
    # sampled candidate is a valid (item_id, item_tag, ...) combination in
    # the shared id space.
    num_sampled_negatives: int = 0
    query_feature_ranges: Sequence[Any] = ()
    # Cosine-logit head: L2-normalize the user/item/capsule outputs and scale
    # the user side by one learned softplus temperature. Per-user ranking is
    # unchanged by the positive scalar, so serving/indexer semantics are
    # identical; only the softmax-training geometry improves — the same fix
    # that took the DSSM tower to 98% of its oracle recall
    # (models/fm.py DSSMTwoTowerRetrieval logit_scale).
    normalize_logits: bool = False
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    def _embedding(self):
        return SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )

    def _behavior(self, emb, inputs):
        """(B, L, F·D) concat-embedded parallel series + (B, L) mask."""
        return embed_series(
            emb, inputs, list(self.sequence_features), self.padding_index
        )

    def _target(self, emb, inputs):
        """(B, F·D) candidate embedding aligned with the behavior block."""
        e = emb(stack_ids(inputs, list(self.query_features)))
        return e.reshape(e.shape[0], -1)

    def _profile_vec(self, emb, inputs):
        if not self.user_features:
            return None
        e = emb(stack_ids(inputs, list(self.user_features)))
        return e.reshape(e.shape[0], -1)

    def _finalize(self, out: Outputs, emb, train: bool, inputs: Inputs = None) -> Outputs:
        """Shared output post-pass: optional cosine-logit normalization
        (normalize_logits) + optional sampled-negative logits
        (num_sampled_negatives). Every _RetrievalBase model returns through
        here so the two training-geometry knobs compose identically across
        MIND/SDM/ComiRec/SINE."""
        out = dict(out)
        if self.normalize_logits:
            scale = nn.softplus(
                self.param(
                    "logit_scale", nn.initializers.constant(10.0), (), jnp.float32
                )
            )

            def unit(x):
                x32 = x.astype(jnp.float32)
                return x32 / (
                    jnp.linalg.norm(x32, axis=-1, keepdims=True) + 1e-6
                )

            u = unit(out["user_embedding"]) * scale
            i = unit(out["item_embedding"])
            out["user_embedding"], out["item_embedding"] = u, i
            if "interest_capsules" in out:
                out["interest_capsules"] = unit(out["interest_capsules"]) * scale
            out["output"] = jnp.sum(u * i, axis=-1)
        if train and self.num_sampled_negatives > 0:
            out["logits"] = self._sampled_logits(
                emb, out["user_embedding"], out["item_embedding"], inputs
            )
        return out

    def _sampled_logits(
        self, emb, user_vec: jnp.ndarray, target: jnp.ndarray, inputs: Inputs = None
    ):
        """[pos ∥ N sampled-negative] inner-product logits (see
        num_sampled_negatives). Accidental hits — a sampled negative whose id
        tuple equals the row's positive — are masked to -1e9, matching
        tf.nn.sampled_softmax_loss's default remove_accidental_hits (the
        sampler the reference trains with, 6.MIND/CustomLayers.py:853-863)."""
        b = user_vec.shape[0]
        n = self.num_sampled_negatives
        f = len(self.query_features)
        ranges = list(self.query_feature_ranges) or [(1, self.vocab_size)] * f
        rng = self.make_rng("sampling")
        cols = []
        for j, (lo, hi) in enumerate(ranges):
            lo = int(lo)
            if lo <= self.padding_index < int(hi):
                lo = self.padding_index + 1  # never sample the padding id
            cols.append(
                jax.random.randint(jax.random.fold_in(rng, j), (b, n), lo, int(hi))
            )
        neg_ids = jnp.stack(cols, axis=-1)  # (B, N, F)
        neg_emb = emb(neg_ids).reshape(b, n, -1).astype(jnp.float32)
        if self.normalize_logits:  # match the cosine geometry of _finalize
            neg_emb = neg_emb / (
                jnp.linalg.norm(neg_emb, axis=-1, keepdims=True) + 1e-6
            )
        u = user_vec.astype(jnp.float32)
        pos = jnp.einsum("bd,bd->b", u, target.astype(jnp.float32))[:, None]
        negs = jnp.einsum("bd,bnd->bn", u, neg_emb.astype(jnp.float32))
        if inputs is not None:
            pos_ids = stack_ids(inputs, list(self.query_features))  # (B, F)
            hit = jnp.all(neg_ids == pos_ids[:, None, :], axis=-1)  # (B, N)
            negs = jnp.where(hit, -1e9, negs)
        return jnp.concatenate([pos, negs], axis=-1)


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
        cap_dim = behavior.shape[-1]  # F·D (reference capsules_dim, :179)
        capsules, cap_mask = CapsuleRouting(
            self.num_interests, cap_dim, mode="shared", dtype=self.dtype, name="routing"
        )(behavior, mask)
        profile = self._profile_vec(emb, inputs)
        if profile is not None:
            b, k, d = capsules.shape
            prof = jnp.broadcast_to(profile[:, None, :], (b, k, profile.shape[-1]))
            merged = jnp.concatenate([capsules, prof], axis=-1)
            capsules = MLP(
                tuple(self.hidden_dims) + (cap_dim,),
                out_activation="linear", dtype=self.dtype, name="capsule_mlp",
            )(merged, train=train)
        target = self._target(emb, inputs)
        user_vec = LabelAwareAttention(self.attention_power, name="label_att")(
            capsules, cap_mask, target
        )
        out: Outputs = {
            "user_embedding": user_vec,
            "item_embedding": target,
            "interest_capsules": capsules,
            "capsule_mask": cap_mask,
            "output": jnp.sum(
                user_vec.astype(jnp.float32) * target.astype(jnp.float32), axis=-1
            ),
        }
        return self._finalize(out, emb, train, inputs)


def _attn_pool(user_q: jnp.ndarray, x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Scaled dot-product user-query attention pooling (reference AttnNet,
    6.MIND/CustomLayers.py:288-308): q = (B, D) user vector, k = v = (B, L, D)."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(x.shape[-1], jnp.float32))
    logits = jnp.einsum(
        "bld,bd->bl", x.astype(jnp.float32), user_q.astype(jnp.float32)
    ) * scale
    logits = jnp.where(m.astype(bool), logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1) * (jnp.sum(m, -1, keepdims=True) > 0)
    return jnp.einsum("bl,bld->bd", w.astype(x.dtype), x)


class SDM(_RetrievalBase):
    """Sequential deep matching (reference SDMLayer,
    6.MIND/CustomLayers.py:430-525).

    Short-term channel (ShortTermInterestExtractor :311-361): the most recent
    ``short_len`` valid steps, concat-embedded over all behavior series, run
    through STACKED LSTMs → rectangular self-MHA over valid×valid positions →
    user-query attention pooling.
    Long-term channel (LongTermInterestExtractor :364-395): PER-SERIES
    user-query attention over each feature sequence separately, concatenated
    and projected with tanh.
    FusionGate (:398-427): g = σ(W₁u + W₂long + W₃short + b);
    user = (1−g)·long + g·short.

    The reference logs separate long/short series per event; our sequence data
    model carries one (multi-feature) history, so the short-term window is the
    most recent ``short_len`` valid steps of that history and the long-term
    channel attends over the full history.
    """

    short_len: int = 10  # last N valid steps form the short-term window
    num_heads: int = 2
    lstm_layers: int = 2

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        from tpurec.ops.hashing import gather_steps

        emb = self._embedding()
        behavior, mask = self._behavior(emb, inputs)  # (B, L, F·D)
        b, l, d = behavior.shape
        profile = self._profile_vec(emb, inputs)
        # separate user projections for each channel (reference user_to_short
        # Dense(F·D, tanh) / user_to_long Dense(D, tanh), :449-450)
        user_short = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="user_to_short")(profile))
        user_long = jnp.tanh(
            nn.Dense(self.embed_dim, dtype=self.dtype, name="user_to_long")(profile)
        )
        # ---- short-term: gather the last short_len VALID steps into a
        # compact window (history is oldest→newest with tail padding)
        s = min(self.short_len, l)
        lengths = jnp.sum(mask, axis=-1, keepdims=True)  # (B, 1)
        win_pos = lengths - s + jnp.arange(s)[None, :]  # (B, s) absolute positions
        win_mask = (win_pos >= 0).astype(mask.dtype)
        win_idx = jnp.clip(win_pos, 0, l - 1).astype(jnp.int32)
        short_seq = gather_steps(behavior, win_idx)  # (B, s, F·D)
        short_seq = short_seq * win_mask[..., None].astype(short_seq.dtype)
        states = MaskedLSTM(
            d, num_layers=self.lstm_layers, dtype=self.dtype, name="short_lstm"
        )(short_seq, win_mask)
        # rectangular valid×valid self-attention mask (reference :344-355)
        rect = win_mask[:, :, None] * win_mask[:, None, :]
        states = MultiHeadAttention(
            self.num_heads, max(1, d // self.num_heads), dtype=self.dtype, name="short_mha"
        )(states, mask=rect, train=train)
        s_t = _attn_pool(user_short, states, win_mask)  # (B, F·D)
        # ---- long-term: per-feature-series user-query attention (:364-395)
        pooled_series = []
        for sname in self.sequence_features:
            series = emb(inputs[sname])  # (B, L, D)
            pooled_series.append(_attn_pool(user_long, series, mask))
        p_t = jnp.concatenate(pooled_series, axis=-1)  # (B, F·D)
        p_t = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="long_proj")(p_t))
        # ---- fusion gate (:398-427)
        gate = nn.sigmoid(
            nn.Dense(d, dtype=self.dtype, name="gate_user")(user_short)
            + nn.Dense(d, dtype=self.dtype, name="gate_long")(p_t)
            + nn.Dense(d, dtype=self.dtype, name="gate_short")(s_t)
        )
        user_vec = (1.0 - gate) * p_t + gate * s_t
        target = self._target(emb, inputs)
        out: Outputs = {
            "user_embedding": user_vec,
            "item_embedding": target,
            "output": jnp.sum(
                user_vec.astype(jnp.float32) * target.astype(jnp.float32), axis=-1
            ),
        }
        return self._finalize(out, emb, train, inputs)


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
        target = self._target(emb, inputs)
        # hard capsule selection by inner product with the target; under the
        # cosine head (normalize_logits) select by COSINE instead so training
        # selection and the normalized serving geometry agree — with unequal
        # capsule norms the raw argmax can pick a capsule other than the
        # max-cosine one that _finalize later serves
        sel_caps = capsules.astype(jnp.float32)
        if self.normalize_logits:
            sel_caps = sel_caps / (
                jnp.linalg.norm(sel_caps, axis=-1, keepdims=True) + 1e-6
            )
        scores = jnp.einsum("bkd,bd->bk", sel_caps, target.astype(jnp.float32))
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
        return self._finalize(out, emb, train, inputs)


# ComiRec's aggregate-diversity greedy inference lives with the serving layer
# (tpurec/serving/diversity.py — reference greedy_search_inference/_parallel,
# 6.MIND/CustomLayers.py:868-963); re-exported here for model-side callers.
from tpurec.serving.diversity import greedy_diverse_topk  # noqa: E402,F401


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
        target = self._target(emb, inputs)
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
        return self._finalize(out, emb, train, inputs)
