"""Chapter-11 models: FiBiNet++, MaskNet (serial/parallel), ContextNet
(reference 11.FiBiNet++/CustomLayers.py).

Data model (reference :124-126): continuous features enter as value-scaled id
embeddings; categorical embeddings are batch-normalized, continuous ones get
per-field LayerNorm (NormInputFeaturesEmbeddingLayer :78-145).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from tpurec.embedding.modules import SharedEmbedding
from tpurec.models.base import (
    Inputs,
    Outputs,
    binary_output,
    stack_continuous,
    stack_ids,
)
from tpurec.ops.interactions import pair_indices
from tpurec.ops.mlp import MLP


class _NormEmbedBase(nn.Module):
    feature_names: Sequence[str]
    vocab_size: int
    continuous_names: Sequence[str] = ()
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    def norm_embed(self, inputs, train: bool) -> jnp.ndarray:
        """(B, F, D): BN over categorical embeddings; value-scaled learned
        embeddings with per-field LN for continuous features
        (reference NormInputFeaturesEmbeddingLayer,
        11.FiBiNet++/CustomLayers.py:78-145)."""
        ids = stack_ids(inputs, self.feature_names)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)
        b, f, d = emb.shape
        emb = nn.BatchNorm(use_running_average=not train, name="cat_bn", dtype=self.dtype)(
            emb.reshape(b, f * d)
        ).reshape(b, f, d)
        cont = stack_continuous(inputs, self.continuous_names)
        if cont is not None:
            table = self.param(
                "cont_emb",
                nn.initializers.glorot_uniform(),
                (len(self.continuous_names), d),
                jnp.float32,
            ).astype(emb.dtype)
            scaled = cont[..., None].astype(emb.dtype) * table[None]
            scaled = nn.LayerNorm(name="cont_ln", dtype=self.dtype)(scaled)
            emb = jnp.concatenate([emb, scaled], axis=1)
        return emb


class FiBiNetPlusPlus(_NormEmbedBase):
    """Bilinear+ ∥ SENet+ → MLP (reference FiBiNetPlusLayer :148-178).

    Bilinear+: scalar products per field pair, (be,be->b), then a 1×N reduce
    layer (:208-242). SENet+: grouped mean+max squeeze with full-dim
    excitation (:181-205)."""

    senet_groups: int = 2
    reduction: int = 3
    reduce_dim: int = 32

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self.norm_embed(inputs, train)
        b, f, d = emb.shape
        # --- Bilinear+
        iu, ju = pair_indices(f)
        w = self.param("bilinear_w", nn.initializers.glorot_uniform(), (d, d), jnp.float32)
        left = jnp.einsum("bpd,de->bpe", emb[:, iu, :], w.astype(emb.dtype))
        scalars = jnp.einsum("bpe,bpe->bp", left, emb[:, ju, :])  # (B, P)
        bilinear = nn.Dense(self.reduce_dim, dtype=self.dtype, name="bilinear_reduce")(scalars)
        # --- SENet+: per-field grouped mean+max squeeze → excitation over F*D
        g = self.senet_groups
        assert d % g == 0, f"embed_dim {d} not divisible by senet_groups {g}"
        grouped = emb.reshape(b, f, g, d // g)
        squeeze = jnp.concatenate(
            [jnp.mean(grouped, -1), jnp.max(grouped, -1)], axis=-1
        ).reshape(b, f * 2 * g)
        mid = max(1, (f * 2 * g) // self.reduction)
        h = nn.relu(nn.Dense(mid, dtype=self.dtype, name="se_squeeze")(squeeze))
        excite = nn.Dense(f * d, dtype=self.dtype, name="se_excite")(h)
        se = nn.LayerNorm(name="se_ln", dtype=self.dtype)(
            emb.reshape(b, f * d) * (2.0 * nn.sigmoid(excite))
        )
        x = jnp.concatenate([bilinear, se], axis=-1)
        hmlp = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(x, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(hmlp)
        return binary_output(logit)


class MaskBlock(nn.Module):
    """Instance-guided mask block: out = LN(W·(V ⊙ mask(V_in)))
    (reference MaskBlockLayer + make_instance_guided_mask,
    11.FiBiNet++/CustomLayers.py:314-335)."""

    hidden_dim: int
    mask_hidden: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, v: jnp.ndarray, v_mask_input: jnp.ndarray) -> jnp.ndarray:
        m = nn.relu(nn.Dense(self.mask_hidden, dtype=self.dtype, name="mask_fc1")(v_mask_input))
        m = nn.Dense(v.shape[-1], dtype=self.dtype, name="mask_fc2")(m)
        masked = v * m
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="hidden")(masked)
        return nn.relu(nn.LayerNorm(name="ln", dtype=self.dtype)(h))


class MaskNet(_NormEmbedBase):
    """Serial or parallel mask blocks (reference SerialMaskNetLayer /
    ParralledMaskNetLayer, 11.FiBiNet++/CustomLayers.py:340-409)."""

    mode: str = "parallel"  # 'serial' | 'parallel'
    num_blocks: int = 3
    block_dim: int = 64

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self.norm_embed(inputs, train)
        b = emb.shape[0]
        flat = emb.reshape(b, -1)
        if self.mode == "serial":
            v = flat
            for i in range(self.num_blocks):
                v = MaskBlock(self.block_dim, dtype=self.dtype, name=f"block_{i}")(v, flat)
            h = v
        else:
            outs = [
                MaskBlock(self.block_dim, dtype=self.dtype, name=f"block_{i}")(flat, flat)
                for i in range(self.num_blocks)
            ]
            h = jnp.concatenate(outs, axis=-1)
            h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(h, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)


class ContextNet(_NormEmbedBase):
    """Contextual embedding + per-field FFN blocks (reference
    ContextualEmbeddingLayer / ContextNetBlockLayer,
    11.FiBiNet++/CustomLayers.py:412-531): each field's embedding is
    modulated by a mask computed from the full concatenated context, then
    refined by stacked point-wise ('pointwise') or single-layer ('singlelayer')
    feed-forward blocks with per-field LN."""

    num_blocks: int = 2
    block_mode: str = "pointwise"  # 'pointwise' | 'singlelayer'
    agg_dim: int = 64

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self.norm_embed(inputs, train)
        b, f, d = emb.shape
        context = emb.reshape(b, f * d)
        # contextual mask per field (aggregation → per-field projection)
        agg = nn.relu(nn.Dense(self.agg_dim, dtype=self.dtype, name="ctx_agg")(context))
        mask = self.param(
            "ctx_proj", nn.initializers.glorot_uniform(), (f, self.agg_dim, d), jnp.float32
        )
        ctx_mask = jnp.einsum("ba,fad->bfd", agg, mask.astype(emb.dtype))
        h = emb * ctx_mask
        for i in range(self.num_blocks):
            if self.block_mode == "pointwise":
                ff = nn.Dense(d, use_bias=False, dtype=self.dtype, name=f"ffn_{i}")(h)
            else:
                w = self.param(
                    f"ffn_w_{i}", nn.initializers.glorot_uniform(), (f, d, d), jnp.float32
                )
                ff = jnp.einsum("bfd,fde->bfe", h, w.astype(h.dtype))
            h = nn.LayerNorm(name=f"ln_{i}", dtype=self.dtype)(nn.relu(ff) + h)
        hmlp = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(
            h.reshape(b, -1), train=train
        )
        logit = nn.Dense(1, dtype=self.dtype, name="head")(hmlp)
        return binary_output(logit)
