"""Long-sequence ranking, stage-one/stage-two cascades: SIM, CAN, ETA
(chapter 7 of the reference, 7.SIM/CustomLayers.py).

Output contract (reference shared ModelManager, SURVEY §2.7): two 2-class
logit heads ``gsu_logits`` / ``esu_logits``; training uses
loss='gsu_esu' (0.2/0.8 softmax CE), AUC from the ESU positive-class prob.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from tpurec.embedding.modules import SharedEmbedding
from tpurec.models.base import Inputs, Outputs, embed_series, sequence_mask, stack_ids
from tpurec.ops.attention import DinTargetAttention, MultiHeadAttention
from tpurec.ops.hashing import (
    gather_steps,
    hamming_similarity,
    lsh_attention,
    simhash_bits,
    topk_select,
)
from tpurec.ops.mlp import MLP
from tpurec.ops.sequence import MaskedGRU


class _LongSeqBase(nn.Module):
    user_features: Sequence[str]
    item_features: Sequence[str]
    sequence_features: Sequence[str]
    query_features: Sequence[str] = ("item_id",)
    vocab_size: int = 0
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    padding_index: int = 0
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    def _embedding(self):
        return SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )

    def _profile(self, emb, inputs):
        names = list(self.user_features) + list(self.item_features)
        e = emb(stack_ids(inputs, names))
        return e.reshape(e.shape[0], -1)

    def _query(self, emb, inputs):
        e = emb(stack_ids(inputs, list(self.query_features)))
        return e.reshape(e.shape[0], -1)

    def _keys(self, emb, inputs):
        """(B, L, F·D) concat-embedded parallel behavior series + mask."""
        return embed_series(
            emb, inputs, list(self.sequence_features), self.padding_index
        )

    def _two_class_head(self, x, name, train):
        h = MLP(self.hidden_dims, dtype=self.dtype, name=f"{name}_mlp")(x, train=train)
        return nn.Dense(2, dtype=self.dtype, name=f"{name}_head")(h).astype(jnp.float32)


class SIM(_LongSeqBase):
    """Search-based interest model (reference SIMLayer,
    7.SIM/CustomLayers.py:203-282):

    GSU — general search unit: inner-product attention pool over the FULL
    sequence (:88-95) → gsu_logits; its scores drive a top-k soft search
    (:236-260) selecting the sub-sequence.
    ESU — exact search unit: recurrent trunk + target MHA over the retrieved
    sub-sequence (:130-201) → esu_logits.
    """

    topk: int = 16
    num_heads: int = 2
    # compose a DIEN submodule named 'trunk' as the ESU trunk (reference
    # ESULayer's frozen pretrained DIEN, 7.SIM/CustomLayers.py:155-157);
    # pretrain→freeze via Trainer.init_from_export + TrainConfig.freeze_prefixes
    use_dien_trunk: bool = False

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self._embedding()
        profile = self._profile(emb, inputs)
        query = self._query(emb, inputs)
        keys, mask = self._keys(emb, inputs)
        d = keys.shape[-1]
        # ---- GSU: inner-product attention over the full sequence
        scores = jnp.einsum(
            "bld,bd->bl", keys.astype(jnp.float32), query.astype(jnp.float32)
        )
        w = jax.nn.softmax(jnp.where(mask.astype(bool), scores, -1e9), axis=-1)
        w = w * (jnp.sum(mask, -1, keepdims=True) > 0)
        gsu_pool = jnp.einsum("bl,bld->bd", w.astype(keys.dtype), keys)
        gsu_logits = self._two_class_head(
            jnp.concatenate([profile, query, gsu_pool, query * gsu_pool], -1),
            "gsu",
            train,
        )
        # ---- soft search: top-k steps by the GSU scores
        top_idx, top_mask = topk_select(scores, mask, min(self.topk, keys.shape[1]))
        sub = gather_steps(keys, top_idx)
        sub_mask = top_mask
        # ---- ESU: recurrent trunk + target MHA over the retrieved
        # sub-sequence; optionally a DIEN submodule as the trunk whose
        # pre-head features join the head input (reference :130-201)
        states = MaskedGRU(d, dtype=self.dtype, name="esu_rnn")(sub, sub_mask)
        att = MultiHeadAttention(
            self.num_heads, max(1, d // self.num_heads), dtype=self.dtype, name="esu_mha"
        )(query[:, None, :], kv=states, mask=sub_mask, train=train)[:, 0]
        esu_in = [profile, query, att, query * att]
        if self.use_dien_trunk:
            from tpurec.models.din import DIEN

            trunk_out = DIEN(
                user_features=self.user_features,
                item_features=self.item_features,
                sequence_features=self.sequence_features,
                query_features=self.query_features,
                vocab_size=self.vocab_size,
                embed_dim=self.embed_dim,
                padding_index=self.padding_index,
                aux_weight=0.0,
                dtype=self.dtype,
                mesh=self.mesh,
                name="trunk",
            )(inputs, train=train)
            esu_in.append(trunk_out["trunk_features"])
        esu_logits = self._two_class_head(
            jnp.concatenate(esu_in, -1), "esu", train
        )
        p = jax.nn.softmax(esu_logits, axis=-1)[:, 1]
        return {
            "gsu_logits": gsu_logits,
            "esu_logits": esu_logits,
            "output": p,
            "topk_indices": top_idx,
        }


class CoActionUnit(nn.Module):
    """CAN co-action: the induction feature's embedding IS the weight tensor
    of a micro-MLP applied to the feed feature (reference CoActionUnit,
    7.SIM/CustomLayers.py:285-378; W/B slicing :313-327, orders :355).

    The induction embedding (dim = Σ_l (in_l·out_l + out_l)) is sliced into
    per-sample weights/biases; the feed features (and their element-wise
    powers up to ``orders``) pass through the micro-MLP.
    """

    layer_dims: Sequence[int] = (4, 4)  # micro-MLP widths
    orders: int = 2

    @nn.compact
    def __call__(
        self,
        induction: jnp.ndarray,  # (B, W) packed micro-MLP params
        feed: jnp.ndarray,  # (B, L, D) feed features
        mask: Optional[jnp.ndarray] = None,  # (B, L)
    ) -> jnp.ndarray:
        b, l, d = feed.shape
        outs = []
        for order in range(1, self.orders + 1):
            x = jnp.power(feed, order)
            offset = 0
            in_dim = d
            for width in self.layer_dims:
                w = induction[:, offset : offset + in_dim * width].reshape(b, in_dim, width)
                offset += in_dim * width
                bias = induction[:, offset : offset + width]
                offset += width
                x = jnp.tanh(
                    jnp.einsum("bld,bdw->blw", x, w.astype(x.dtype))
                    + bias[:, None, :].astype(x.dtype)
                )
                in_dim = width
            if mask is not None:
                x = x * mask[..., None].astype(x.dtype)
            outs.append(jnp.sum(x, axis=1))  # sum-pool over the sequence
        return jnp.concatenate(outs, axis=-1)

    @staticmethod
    def packed_dim(feed_dim: int, layer_dims: Sequence[int]) -> int:
        total = 0
        in_dim = feed_dim
        for width in layer_dims:
            total += in_dim * width + width
            in_dim = width
        return total


class CAN(_LongSeqBase):
    """Co-action network (reference CANLayer, 7.SIM/CustomLayers.py:381-450):
    base sequential trunk (gsu head) + PER-FIELD co-action features — one
    CoActionUnit per (candidate field, matching behavior series) pair
    (reference :414-446: i_goods_id×visited_goods_ids, i_shop_id×…), each
    candidate field's induction embedding parameterizing a micro-MLP applied
    both to its behavior series (sum-pooled) and to the user profile fields
    treated as a length-U sequence (reference user_output :440-441).

    ``use_dien_trunk=True`` swaps the base GRU trunk for a full DIEN submodule
    named 'trunk' whose pre-head features feed both heads — the reference
    composes a FROZEN pretrained DIEN the same way (:404-406); load + freeze
    via Trainer.init_from_export / TrainConfig.freeze_prefixes."""

    co_layer_dims: Sequence[int] = (4, 4)
    co_orders: int = 2
    use_dien_trunk: bool = False

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self._embedding()
        profile = self._profile(emb, inputs)
        query = self._query(emb, inputs)
        keys, mask = self._keys(emb, inputs)
        d = keys.shape[-1]
        if self.use_dien_trunk:
            from tpurec.models.din import DIEN

            trunk_out = DIEN(
                user_features=self.user_features,
                item_features=self.item_features,
                sequence_features=self.sequence_features,
                query_features=self.query_features,
                vocab_size=self.vocab_size,
                embed_dim=self.embed_dim,
                padding_index=self.padding_index,
                aux_weight=0.0,
                dtype=self.dtype,
                mesh=self.mesh,
                name="trunk",
            )(inputs, train=train)
            pooled = trunk_out["trunk_features"]
        else:
            # base trunk: GRU + mean pool
            states = MaskedGRU(d, dtype=self.dtype, name="trunk_rnn")(keys, mask)
            w_mask = mask[..., None].astype(states.dtype)
            pooled = jnp.sum(states * w_mask, 1) / jnp.maximum(jnp.sum(w_mask, 1), 1.0)
        gsu_logits = self._two_class_head(
            jnp.concatenate([profile, query, pooled], -1), "gsu", train
        )
        # per-field co-action: separate induction table per candidate field
        dim = self.embed_dim
        packed = CoActionUnit.packed_dim(dim, self.co_layer_dims)
        user_feed = emb(stack_ids(inputs, list(self.user_features)))  # (B, U, D)
        co_parts = []
        for qf, sname in zip(self.query_features, self.sequence_features):
            induction = SharedEmbedding(
                self.vocab_size, packed, dtype=self.dtype, mesh=self.mesh,
                name=f"induction_emb_{qf}",
            )(inputs[qf].reshape(-1))
            unit = CoActionUnit(
                layer_dims=tuple(self.co_layer_dims), orders=self.co_orders,
                name=f"coaction_{qf}",
            )
            series = emb(inputs[sname])  # (B, L, D)
            co_parts.append(unit(induction, series, mask))
            co_parts.append(unit(induction, user_feed, None))
        co = jnp.concatenate(co_parts, axis=-1)
        esu_logits = self._two_class_head(
            jnp.concatenate([profile, query, pooled, co], -1), "esu", train
        )
        return {
            "gsu_logits": gsu_logits,
            "esu_logits": esu_logits,
            "output": jax.nn.softmax(esu_logits, -1)[:, 1],
        }


class ETA(_LongSeqBase):
    """End-to-end target attention (reference ETALayer,
    7.SIM/CustomLayers.py:518-626): SimHash codes via sign projections, top-k
    long-term retrieval by Hamming similarity (:556-582), MHA for short- and
    long-term interest. The hash projection is a fixed (non-trainable) random
    matrix so codes stay stable end-to-end."""

    topk: int = 16
    short_len: int = 8
    n_hash_bits: int = 16
    num_heads: int = 2
    #: contextualize the long-term series with bucketed LSH self-attention
    #: before retrieval (the reference's Reformer-style LSHAttention,
    #: 7.SIM/CustomLayers.py:453-515 — demo-only there, an opt-in mode here)
    lsh_self_attention: bool = False
    lsh_self_bits: int = 4

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self._embedding()
        profile = self._profile(emb, inputs)
        query = self._query(emb, inputs)
        keys, mask = self._keys(emb, inputs)
        b, l, d = keys.shape
        if self.lsh_self_attention:
            self_proj = self.variable(
                "constants",
                "lsh_self_proj",
                lambda: jax.random.normal(
                    jax.random.key(11), (d, self.lsh_self_bits), jnp.float32
                ),
            ).value
            ctx = lsh_attention(
                keys.astype(jnp.float32), keys.astype(jnp.float32), self_proj, mask
            ).astype(keys.dtype)
            keys = keys + ctx * mask[..., None].astype(keys.dtype)  # residual
        proj = self.variable(
            "constants",
            "hash_proj",
            lambda: jax.random.normal(jax.random.key(3), (d, self.n_hash_bits), jnp.float32),
        ).value
        # long-term: Hamming top-k retrieval against the candidate's code
        q_bits = simhash_bits(query.astype(jnp.float32), proj)
        k_bits = simhash_bits(keys.astype(jnp.float32), proj)
        sim = hamming_similarity(q_bits, k_bits).astype(jnp.float32)
        top_idx, top_mask = topk_select(sim, mask, min(self.topk, l))
        sub = gather_steps(keys, top_idx)
        long_att = MultiHeadAttention(
            self.num_heads, max(1, d // self.num_heads), dtype=self.dtype, name="long_mha"
        )(query[:, None, :], kv=sub, mask=top_mask, train=train)[:, 0]
        gsu_logits = self._two_class_head(
            jnp.concatenate([profile, query, long_att], -1), "gsu", train
        )
        # short-term: MHA over the most recent valid steps
        idx = jnp.arange(l)[None, :]
        lengths = jnp.sum(mask, -1, keepdims=True)
        short_mask = mask * (idx >= lengths - self.short_len).astype(mask.dtype)
        short_att = MultiHeadAttention(
            self.num_heads, max(1, d // self.num_heads), dtype=self.dtype, name="short_mha"
        )(query[:, None, :], kv=keys, mask=short_mask, train=train)[:, 0]
        esu_logits = self._two_class_head(
            jnp.concatenate([profile, query, long_att, short_att], -1), "esu", train
        )
        return {
            "gsu_logits": gsu_logits,
            "esu_logits": esu_logits,
            "output": jax.nn.softmax(esu_logits, -1)[:, 1],
            "topk_indices": top_idx,
        }
