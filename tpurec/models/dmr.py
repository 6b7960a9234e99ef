"""Chapter-8 ranking models: DMR, DMT, FinalMLP, SDIM
(reference 8.DMR/CustomLayers.py).

- DMR: I2I + U2I matching networks with position embeddings and a train-time
  auxiliary loss (binary head).
- DMT: per-behavior-channel transformers + MMOE multi-task head with optional
  position-bias towers (multi_task loss).
- FinalMLP: dual gated feature-selection views + two MLP streams fused by a
  multi-head bilinear term (binary head).
- SDIM: multi-group SimHash sketch pooling of the long sequence + short-term
  MHA (gsu/esu two-stage contract like chapter 7; sketches reuse
  tpurec.ops.hashing.sketch_pool). The serving-time stateful ``lsh_dict``
  store (8.DMR/CustomLayers.py:849-909) lives host-side in
  tpurec.serving.sketch_store, outside the jitted graph.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from tpurec.embedding.modules import SharedEmbedding
from tpurec.models.base import (
    Inputs,
    Outputs,
    binary_output,
    embed_series,
    series_mask,
    stack_ids,
)
from tpurec.ops.attention import MultiHeadAttention
from tpurec.ops.hashing import make_projections, sketch_pool, simhash_bits
from tpurec.ops.mlp import MLP
from tpurec.ops.sequence import LearnedPositionEmbedding


class DMR(nn.Module):
    """Deep match to rank (reference DMRLayer, 8.DMR/CustomLayers.py:76-200).

    I2I network (:203-248): a(t) = z·tanh(Wc·cand + We·seq_t + Wp·pos_t);
    masked softmax weights pool the sequence, and the *sum of raw scores* is
    itself a scalar relevance feature.
    U2I network (:251-316): position-only attention pools the sequence into a
    user vector scored against the candidate by inner product; auxiliary loss
    pushes the prefix-pooled user vector toward the last real behavior
    (in-batch negatives).
    """

    user_features: Sequence[str]
    item_features: Sequence[str]
    sequence_features: Sequence[str]
    query_features: Sequence[str] = ("item_id",)
    vocab_size: int = 0
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (80, 40)
    attention_dim: int = 32
    aux_weight: float = 0.1
    padding_index: int = 0
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )
        profile_ids = stack_ids(inputs, list(self.user_features) + list(self.item_features))
        profile = emb(profile_ids).reshape(profile_ids.shape[0], -1)
        query = emb(stack_ids(inputs, list(self.query_features)))
        query = query.reshape(query.shape[0], -1)
        keys, mask = embed_series(
            emb, inputs, list(self.sequence_features), self.padding_index
        )  # (B, L, F·D)
        b, l, d = keys.shape
        pos = LearnedPositionEmbedding(l, d, dtype=self.dtype, name="pos")(l)
        # ---- I2I attention
        a = self.attention_dim
        h = (
            nn.Dense(a, dtype=self.dtype, name="i2i_wc")(query)[:, None, :]
            + nn.Dense(a, dtype=self.dtype, name="i2i_we")(keys)
            + nn.Dense(a, dtype=self.dtype, name="i2i_wp")(pos)[None]
        )
        scores = nn.Dense(1, use_bias=False, dtype=self.dtype, name="i2i_z")(
            jnp.tanh(h)
        ).reshape(b, l).astype(jnp.float32)
        masked_scores = jnp.where(mask.astype(bool), scores, -1e9)
        w = jax.nn.softmax(masked_scores, axis=-1) * (jnp.sum(mask, -1, keepdims=True) > 0)
        i2i_pool = jnp.einsum("bl,bld->bd", w.astype(keys.dtype), keys)
        rel_feature = jnp.sum(jnp.where(mask.astype(bool), scores, 0.0), -1, keepdims=True)
        # ---- U2I: position-only attention → user vector
        u_scores = nn.Dense(1, use_bias=False, dtype=self.dtype, name="u2i_z")(
            jnp.tanh(nn.Dense(a, dtype=self.dtype, name="u2i_wp")(pos))
        ).reshape(1, l).astype(jnp.float32)
        u_scores = jnp.where(mask.astype(bool), u_scores, -1e9)
        uw = jax.nn.softmax(u_scores, axis=-1) * (jnp.sum(mask, -1, keepdims=True) > 0)
        user_vec = jnp.einsum("bl,bld->bd", uw.astype(keys.dtype), keys)
        user_vec = jnp.tanh(nn.Dense(d, dtype=self.dtype, name="u2i_proj")(user_vec))
        u2i_score = jnp.sum(
            user_vec.astype(jnp.float32) * query.astype(jnp.float32), -1, keepdims=True
        )
        x = jnp.concatenate(
            [profile, query, i2i_pool, query * i2i_pool,
             rel_feature.astype(profile.dtype), u2i_score.astype(profile.dtype)],
            axis=-1,
        )
        hmlp = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(x, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(hmlp)
        out = binary_output(logit)
        if train and self.aux_weight > 0:
            # prefix user vector (exclude the last real step) should retrieve
            # that step against in-batch negatives
            lengths = jnp.sum(mask, axis=-1).astype(jnp.int32)
            last_idx = jnp.maximum(lengths - 1, 0)
            last_emb = jnp.take_along_axis(keys, last_idx[:, None, None], axis=1)[:, 0]
            prefix_mask = mask * (
                jnp.arange(l)[None, :] < last_idx[:, None]
            ).astype(mask.dtype)
            pw = jnp.where(prefix_mask.astype(bool), u_scores, -1e9)
            pw = jax.nn.softmax(pw, axis=-1) * (jnp.sum(prefix_mask, -1, keepdims=True) > 0)
            prefix_vec = jnp.einsum("bl,bld->bd", pw.astype(keys.dtype), keys)
            logits_aux = (
                prefix_vec.astype(jnp.float32) @ last_emb.astype(jnp.float32).T
            )
            labels_aux = jnp.arange(b)
            valid = (lengths > 1).astype(jnp.float32)
            ce = optax_softmax(logits_aux, labels_aux)
            out["auxiliary_loss"] = self.aux_weight * jnp.sum(ce * valid) / jnp.maximum(
                jnp.sum(valid), 1.0
            )
        return out


def optax_softmax(logits, labels):
    import optax

    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


class DMT(nn.Module):
    """Deep multi-interest transformer (reference DMTLayer,
    8.DMR/CustomLayers.py:445-577): one transformer per behavior channel
    (click/cart/order — :473-478) with the candidate as decoder query, MMOE
    experts + per-task gates (:552-568), and optional position-bias towers
    whose logits add before the sigmoid during training (:570-574)."""

    user_features: Sequence[str]
    item_features: Sequence[str]
    sequence_features: Sequence[str]  # one per behavior channel
    query_features: Sequence[str] = ("item_id",)
    task_names: Sequence[str] = ("ctr", "cvr")
    bias_features: Sequence[str] = ()  # e.g. ('position', 'page') if present
    vocab_size: int = 0
    embed_dim: int = 8
    num_heads: int = 2
    num_experts: int = 4
    expert_dims: Sequence[int] = (64, 32)
    tower_dims: Sequence[int] = (32,)
    padding_index: int = 0
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        from tpurec.models.multitask import ExpertBank

        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )
        profile_ids = stack_ids(inputs, list(self.user_features) + list(self.item_features))
        profile = emb(profile_ids).reshape(profile_ids.shape[0], -1)
        query = emb(stack_ids(inputs, list(self.query_features)))
        query = query.reshape(query.shape[0], -1)
        channel_outs = []
        for si, sname in enumerate(self.sequence_features):
            seq_ids = inputs[sname]
            mask = series_mask(inputs, sname, self.padding_index)
            keys = emb(seq_ids)
            l, d = keys.shape[1], keys.shape[2]
            pos = LearnedPositionEmbedding(l, d, dtype=self.dtype, name=f"pos_{si}")(l)
            enc = MultiHeadAttention(
                self.num_heads, max(1, d // self.num_heads), dtype=self.dtype,
                name=f"enc_{si}",
            )(keys + pos[None].astype(keys.dtype), mask=mask, train=train)
            dec = MultiHeadAttention(
                self.num_heads, max(1, d // self.num_heads), use_residual=False,
                dtype=self.dtype, name=f"dec_{si}",
            )(query[:, None, :], kv=enc, mask=mask, train=train)[:, 0]
            channel_outs.append(dec)
        x = jnp.concatenate([profile, query] + channel_outs, axis=-1)
        experts = ExpertBank(self.num_experts, self.expert_dims, dtype=self.dtype, name="experts")(
            x, train=train
        )
        out: Dict[str, jnp.ndarray] = {}
        for task in self.task_names:
            gate = nn.Dense(self.num_experts, dtype=self.dtype, name=f"{task}_gate")(x)
            gate = nn.softmax(gate.astype(jnp.float32), -1).astype(experts.dtype)
            mixed = jnp.einsum("be,beh->bh", gate, experts)
            h = MLP(self.tower_dims, dtype=self.dtype, name=f"{task}_tower")(mixed, train=train)
            logit = nn.Dense(1, dtype=self.dtype, name=f"{task}_head")(h).reshape(-1).astype(jnp.float32)
            # position-bias tower: params always exist (init runs with
            # train=False), but the bias logit is only ADDED during training —
            # serving scores stay de-biased (reference :570-574)
            if self.bias_features:
                bias_in = emb(stack_ids(inputs, list(self.bias_features)))
                bias_in = bias_in.reshape(bias_in.shape[0], -1)
                bias = MLP((16, 1), out_activation="linear", dtype=self.dtype,
                           name=f"{task}_bias_tower")(bias_in, train=train)
                if train:
                    logit = logit + bias.reshape(-1).astype(jnp.float32)
            out[f"{task}_logit"] = logit
            out[f"{task}_output"] = nn.sigmoid(logit)
        return out


class FinalMLP(nn.Module):
    """Dual-stream MLP with bilinear fusion (reference FinalMLPLayer +
    FeatureSelectionLayer + DualPartsInteractionLayer,
    8.DMR/CustomLayers.py:319-442): two sigmoid-gated views of the embedding
    (:406-414) feed two MLP streams fused by multi-head bilinear W₁₂
    (:430-441)."""

    feature_names: Sequence[str]
    vocab_size: int
    embed_dim: int = 8
    stream_dims: Sequence[int] = (64, 32)
    num_fusion_heads: int = 2
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)
        flat = emb.reshape(emb.shape[0], -1)
        # two gated feature views
        def view(name):
            g = nn.Dense(flat.shape[-1], dtype=self.dtype, name=f"{name}_gate")(flat)
            return flat * (2.0 * nn.sigmoid(g))

        s1 = MLP(self.stream_dims, dtype=self.dtype, name="stream1")(view("v1"), train=train)
        s2 = MLP(self.stream_dims, dtype=self.dtype, name="stream2")(view("v2"), train=train)
        h = self.num_fusion_heads
        b = s1.shape[0]
        d1, d2 = s1.shape[-1] // h, s2.shape[-1] // h
        s1h = s1.reshape(b, h, d1)
        s2h = s2.reshape(b, h, d2)
        w12 = self.param(
            "w12", nn.initializers.glorot_uniform(), (h, d1, d2), jnp.float32
        )
        bilinear = jnp.einsum(
            "bhd,hde,bhe->b", s1h.astype(jnp.float32), w12, s2h.astype(jnp.float32)
        )
        lin = nn.Dense(1, dtype=self.dtype, name="lin1")(s1).reshape(-1).astype(jnp.float32)
        lin = lin + nn.Dense(1, dtype=self.dtype, name="lin2")(s2).reshape(-1).astype(jnp.float32)
        return binary_output(bilinear + lin)


class SDIM(nn.Module):
    """Sampling-based deep interest model (reference SDIMLayer,
    8.DMR/CustomLayers.py:772-955): multi-group SimHash sketches pool the
    long sequence by target-bucket collision (:819-841); short-term MHA over
    recent steps; gsu/esu two-stage heads (ch.7/8 shared trainer contract)."""

    user_features: Sequence[str]
    item_features: Sequence[str]
    sequence_features: Sequence[str]
    query_features: Sequence[str] = ("item_id",)
    vocab_size: int = 0
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    num_hash_groups: int = 4
    n_hash_bits: int = 6
    short_len: int = 8
    num_heads: int = 2
    padding_index: int = 0
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )
        profile_ids = stack_ids(inputs, list(self.user_features) + list(self.item_features))
        profile = emb(profile_ids).reshape(profile_ids.shape[0], -1)
        query = emb(stack_ids(inputs, list(self.query_features)))
        query = query.reshape(query.shape[0], -1)
        keys, mask = embed_series(
            emb, inputs, list(self.sequence_features), self.padding_index
        )
        b, l, d = keys.shape
        projections = self.variable(
            "constants",
            "hash_projections",
            lambda: make_projections(jax.random.key(11), self.num_hash_groups, d, self.n_hash_bits),
        ).value
        long_term = sketch_pool(
            keys.astype(jnp.float32), mask, projections, query.astype(jnp.float32)
        ).astype(keys.dtype)
        def head(x, name):
            h = MLP(self.hidden_dims, dtype=self.dtype, name=f"{name}_mlp")(x, train=train)
            return nn.Dense(2, dtype=self.dtype, name=f"{name}_head")(h).astype(jnp.float32)

        gsu_logits = head(
            jnp.concatenate([profile, query, long_term, query * long_term], -1), "gsu"
        )
        idx = jnp.arange(l)[None, :]
        lengths = jnp.sum(mask, -1, keepdims=True)
        short_mask = mask * (idx >= lengths - self.short_len).astype(mask.dtype)
        short = MultiHeadAttention(
            self.num_heads, max(1, d // self.num_heads), dtype=self.dtype, name="short_mha"
        )(query[:, None, :], kv=keys, mask=short_mask, train=train)[:, 0]
        esu_logits = head(
            jnp.concatenate([profile, query, long_term, short, query * short], -1), "esu"
        )
        return {
            "gsu_logits": gsu_logits,
            "esu_logits": esu_logits,
            "output": jax.nn.softmax(esu_logits, -1)[:, 1],
            "long_term_interest": long_term,
        }
