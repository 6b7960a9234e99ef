"""Behavior-sequence ranking: DIN, DIEN, DSIN (chapter 5 of the reference,
5.DIN/CustomLayers.py).

Input contract: ``sequence_features`` are (B, L) padded id tensors aligned
1:1 with ``query_features`` (the candidate item's corresponding ids); other
user/item categorical features form the profile. Masks come from the padding
index (reference 5.DIN/CustomLayers.py:256).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from tpurec.core.mesh import MODEL_AXIS
from tpurec.embedding.modules import SharedEmbedding
from tpurec.models.base import Inputs, Outputs, binary_output, series_mask, stack_ids
from tpurec.ops.attention import DinTargetAttention, MultiHeadAttention
from tpurec.ops.mlp import MLP
from tpurec.ops.sequence import (
    AttentionGRU,
    LearnedPositionEmbedding,
    MaskedBiLSTM,
    MaskedGRU,
)


class _SeqBase(nn.Module):
    user_features: Sequence[str]
    item_features: Sequence[str]  # candidate profile features (incl. query ids)
    sequence_features: Sequence[str]  # (B, L) histories
    query_features: Sequence[str] = ("item_id",)  # aligned with sequence_features
    vocab_size: int = 0
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (200, 80)
    padding_index: int = 0
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    def _embedding(self):
        return SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )

    def _profile(self, emb, inputs) -> jnp.ndarray:
        names = list(self.user_features) + list(self.item_features)
        e = emb(stack_ids(inputs, names))
        return e.reshape(e.shape[0], -1)

    def _query(self, emb, inputs) -> jnp.ndarray:
        """(B, Fq*D) candidate embedding aligned with the sequence features."""
        e = emb(stack_ids(inputs, list(self.query_features)))
        return e.reshape(e.shape[0], -1)

    def _keys(self, emb, inputs):
        """(B, L, Fs*D) behavior embeddings + (B, L) mask."""
        mask = series_mask(inputs, self.sequence_features[0], self.padding_index)
        embs = [emb(inputs[n]) for n in self.sequence_features]  # each (B, L, D)
        keys = jnp.concatenate(embs, axis=-1) if len(embs) > 1 else embs[0]
        return keys, mask


class DIN(_SeqBase):
    """Deep Interest Network: activation-unit target attention over the
    behavior sequence, masked weighted sum-pool, concat with profile → MLP
    (reference DINLayer, 5.DIN/CustomLayers.py:199-289; hot op at :270)."""

    attention_hidden_dims: Sequence[int] = (36,)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self._embedding()
        profile = self._profile(emb, inputs)
        query = self._query(emb, inputs)
        keys, mask = self._keys(emb, inputs)
        pooled, _ = DinTargetAttention(
            hidden_dims=tuple(self.attention_hidden_dims), dtype=self.dtype, name="att"
        )(query, keys, mask, train=train)
        x = jnp.concatenate([profile, query, pooled], axis=-1)
        h = MLP(self.hidden_dims, dtype=self.dtype, tp_axis=MODEL_AXIS, name="mlp")(x, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)


class DIEN(_SeqBase):
    """Deep Interest Evolution: GRU interest extraction + auxiliary
    next-behavior loss + attention-gated (AUGRU) interest evolution
    (reference DIENLayer, 5.DIN/CustomLayers.py:389-517).

    Auxiliary loss (reference get_auxiliary_loss :434-453): for each step t,
    the extracted interest h_t should score the *actual* next behavior
    e_{t+1} above a negative. Negatives come from pipeline-sampled negative
    series when present (``neg_<series>`` input columns — the reference
    prepares neg_hist_seq data-side the same way, 5.DIN/DataGenerator.py);
    otherwise the next behaviors of the batch-rolled neighbor are used
    (jittable in-batch fallback)."""

    gru_mode: str = "augru"  # 'augru' | 'agru' | 'aigru'
    aux_weight: float = 1.0
    attention_hidden_dims: Sequence[int] = (36,)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self._embedding()
        profile = self._profile(emb, inputs)
        query = self._query(emb, inputs)
        keys, mask = self._keys(emb, inputs)
        d = keys.shape[-1]
        interests = MaskedGRU(d, dtype=self.dtype, name="extractor")(keys, mask)
        # attention scores between candidate and each interest state
        _, scores = DinTargetAttention(
            hidden_dims=tuple(self.attention_hidden_dims), dtype=self.dtype, name="att"
        )(query, interests, mask, train=train)
        # softmax over valid steps (reference DienActivationLayer :292-317)
        norm = jnp.where(mask.astype(bool), scores, -1e9)
        norm = jax.nn.softmax(norm, axis=-1) * (jnp.sum(mask, -1, keepdims=True) > 0)
        final = AttentionGRU(d, mode=self.gru_mode, dtype=self.dtype, name="evolution")(
            interests, norm.astype(interests.dtype), mask
        )
        x = jnp.concatenate([profile, query, final], axis=-1)
        h = MLP(self.hidden_dims, dtype=self.dtype, tp_axis=MODEL_AXIS, name="mlp")(x, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        out = binary_output(logit)
        # pre-head feature vector (reference X_combined) so SIM/CAN can
        # compose DIEN as a (frozen, pretrained) trunk — the reference ESU/CAN
        # consume dien_output the same way (7.SIM/CustomLayers.py:155-157,425)
        out["trunk_features"] = x
        if train and self.aux_weight > 0:
            neg_keys = self._neg_keys(emb, inputs)
            out["auxiliary_loss"] = self.aux_weight * self._aux_loss(
                interests, keys, mask, neg_keys
            )
        return out

    def _neg_keys(self, emb, inputs):
        """Embed pipeline-sampled negative behavior series (``neg_<series>``)
        when the batch carries them; None → in-batch fallback."""
        names = [f"neg_{n}" for n in self.sequence_features]
        if not all(n in inputs for n in names):
            return None
        embs = [emb(inputs[n]) for n in names]
        return jnp.concatenate(embs, axis=-1) if len(embs) > 1 else embs[0]

    def _aux_loss(self, interests, keys, mask, neg_keys=None):
        h = interests[:, :-1].astype(jnp.float32)  # (B, L-1, D)
        pos = keys[:, 1:].astype(jnp.float32)
        if neg_keys is not None:
            neg = neg_keys[:, 1:].astype(jnp.float32)  # sampled negatives
        else:
            neg = jnp.roll(pos, 1, axis=0)  # batch-rolled fallback
        m = (mask[:, 1:] * mask[:, :-1]).astype(jnp.float32)
        pos_logit = jnp.sum(h * pos, axis=-1)
        neg_logit = jnp.sum(h * neg, axis=-1)
        loss = jax.nn.softplus(-pos_logit) + jax.nn.softplus(neg_logit)
        return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)


class DSIN(_SeqBase):
    """Deep Session Interest Network: the sequence is divided into sessions,
    each encoded by a transformer with learned bias encodings, session
    interests evolved by a BiLSTM, both levels target-attended by the
    candidate (reference DSINLayer, 5.DIN/CustomLayers.py:541-678; bias
    encodings :600-613, transformer :519-538, BiLSTM :594,663)."""

    num_sessions: int = 5
    num_heads: int = 2
    lstm_dim: int = 16
    attention_hidden_dims: Sequence[int] = (36,)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self._embedding()
        profile = self._profile(emb, inputs)
        query = self._query(emb, inputs)
        keys, mask = self._keys(emb, inputs)
        b, l, d = keys.shape
        s = self.num_sessions
        assert l % s == 0, f"sequence length {l} not divisible by sessions {s}"
        n = l // s
        sess = keys.reshape(b, s, n, d)
        sess_mask = mask.reshape(b, s, n)
        # bias encodings: session + in-session position + feature-dim biases
        bias_sess = self.param("bias_sess", nn.initializers.normal(0.02), (s, 1, 1), jnp.float32)
        bias_pos = self.param("bias_pos", nn.initializers.normal(0.02), (1, n, 1), jnp.float32)
        bias_dim = self.param("bias_dim", nn.initializers.normal(0.02), (1, 1, d), jnp.float32)
        sess = sess + (bias_sess + bias_pos + bias_dim).astype(sess.dtype)[None]
        # per-session transformer encoder (shared weights across sessions)
        flat = sess.reshape(b * s, n, d)
        flat_mask = sess_mask.reshape(b * s, n)
        enc = MultiHeadAttention(
            num_heads=self.num_heads, head_dim=max(1, d // self.num_heads),
            dtype=self.dtype, name="session_encoder",
        )(flat, mask=flat_mask, train=train)
        ffn = nn.Dense(d, dtype=self.dtype, name="ffn")(nn.relu(enc))
        enc = nn.LayerNorm(dtype=self.dtype, name="ffn_ln")(enc + ffn)
        # session interest = masked average pool
        w = flat_mask[..., None].astype(enc.dtype)
        pooled = jnp.sum(enc * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
        interests = pooled.reshape(b, s, d)
        sess_valid = (jnp.sum(sess_mask, axis=-1) > 0).astype(jnp.float32)  # (B, S)
        evolved = MaskedBiLSTM(self.lstm_dim, dtype=self.dtype, name="bilstm")(
            interests, sess_valid
        )
        evolved = nn.Dense(d, dtype=self.dtype, name="bilstm_proj")(evolved)
        att_i, _ = DinTargetAttention(
            hidden_dims=tuple(self.attention_hidden_dims), dtype=self.dtype, name="att_interest"
        )(query, interests, sess_valid, train=train)
        att_e, _ = DinTargetAttention(
            hidden_dims=tuple(self.attention_hidden_dims), dtype=self.dtype, name="att_evolved"
        )(query, evolved, sess_valid, train=train)
        x = jnp.concatenate([profile, query, att_i, att_e], axis=-1)
        h = MLP(self.hidden_dims, dtype=self.dtype, tp_axis=MODEL_AXIS, name="mlp")(x, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)
