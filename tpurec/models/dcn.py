"""DCN-family feature-cross models (chapter 3 of the reference,
3.DCN/CustomLayers.py): DCN (vector & matrix), xDeepFM, NFM, DeepCrossing,
FNN, CCPM, FGCNN, AFM, FiBiNet, AutoInt.

All take categorical features (shared id space) plus optional continuous
features; continuous handling follows the reference: concatenated to the
dense input (DCN :206-269) or value-scaled learned embeddings (AutoInt
:1121-1123).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from tpurec.embedding.modules import LinearEmbedding, SharedEmbedding
from tpurec.models.base import (
    Inputs,
    Outputs,
    binary_output,
    stack_continuous,
    stack_ids,
)
from tpurec.ops.attention import MultiHeadAttention
from tpurec.ops.conv import CCPM, FGCNN, ResidualBlock
from tpurec.ops.interactions import (
    AFMInteraction,
    BilinearInteraction,
    CIN,
    CrossNetwork,
    CrossNetworkMatrix,
    SENet,
    SENetBilinear,
    fm_second_order,
)
from tpurec.ops.mlp import MLP


class _EmbedBase(nn.Module):
    """Shared field-embedding + flattening helpers (not registered itself)."""

    feature_names: Sequence[str]
    vocab_size: int
    continuous_names: Sequence[str] = ()
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    def embed(self, inputs: Inputs) -> jnp.ndarray:
        ids = stack_ids(inputs, self.feature_names)
        return SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)

    def dense_input(self, inputs: Inputs) -> jnp.ndarray:
        """[flattened embeddings ∥ continuous] (reference DCN input concat,
        3.DCN/CustomLayers.py:240-247)."""
        emb = self.embed(inputs)
        parts = [emb.reshape(emb.shape[0], -1)]
        cont = stack_continuous(inputs, self.continuous_names)
        if cont is not None:
            parts.append(cont.astype(parts[0].dtype))
        return jnp.concatenate(parts, axis=-1)


class DCN(_EmbedBase):
    """Deep & Cross: cross tower ∥ deep tower → concat → head
    (reference DeepCrossNetworkLayer, 3.DCN/CustomLayers.py:206-269).
    cross_type 'vector' (DCN) or 'matrix' (DCN-v2)."""

    cross_type: str = "vector"
    num_cross_layers: int = 3

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        x0 = self.dense_input(inputs)
        cross_cls = CrossNetwork if self.cross_type == "vector" else CrossNetworkMatrix
        cross = cross_cls(self.num_cross_layers, dtype=self.dtype, name="cross")(x0)
        deep = MLP(self.hidden_dims, dtype=self.dtype, name="deep")(x0, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(
            jnp.concatenate([cross, deep], axis=-1)
        )
        return binary_output(logit)


class XDeepFM(_EmbedBase):
    """Linear + deep MLP + CIN, summed logits
    (reference XDeepFMRankingLayer, 3.DCN/CustomLayers.py:308-374)."""

    cin_layer_sizes: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)
        linear = jnp.sum(
            LinearEmbedding(self.vocab_size, mesh=self.mesh, name="w")(ids), axis=1
        )
        cin = CIN(tuple(self.cin_layer_sizes), dtype=self.dtype, name="cin")(emb)
        cin_logit = nn.Dense(1, dtype=self.dtype, name="cin_head")(cin).reshape(-1)
        deep = MLP(self.hidden_dims, dtype=self.dtype, name="deep")(
            emb.reshape(emb.shape[0], -1), train=train
        )
        deep_logit = nn.Dense(1, dtype=self.dtype, name="deep_head")(deep).reshape(-1)
        return binary_output(linear + cin_logit + deep_logit)


class NFM(_EmbedBase):
    """Neural FM: bi-interaction pooling → BN → MLP
    (reference NeuralFactorizationMachineLayer, 3.DCN/CustomLayers.py:451-509)."""

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)
        linear = jnp.sum(
            LinearEmbedding(self.vocab_size, mesh=self.mesh, name="w")(ids), axis=1
        )
        bi = fm_second_order(emb, reduce_dim=False)  # (B, D)
        bi = nn.BatchNorm(use_running_average=not train, name="bn")(bi)
        h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(bi, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h).reshape(-1)
        return binary_output(linear + logit)


class DeepCrossing(_EmbedBase):
    """Residual-MLP stack over the dense input
    (reference DeepCrossingLayer + ResLayer, 3.DCN/CustomLayers.py:512-575)."""

    num_blocks: int = 3
    residual_dim: int = 64

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        x = self.dense_input(inputs)
        for i in range(self.num_blocks):
            x = ResidualBlock(self.residual_dim, dtype=self.dtype, name=f"res_{i}")(x)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(x)
        return binary_output(logit)


class FNN(_EmbedBase):
    """FM-initialized NN: embeddings → MLP. The reference freezes a loaded FM
    SavedModel table as a constant (3.DCN/CustomLayers.py:594-596 — a known
    hack); here the table is a normal trainable param that can be seeded from
    a trained FM via ``init_embedding_from_fm``."""

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        x = self.dense_input(inputs)
        h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(x, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)

    @staticmethod
    def init_embedding_from_fm(fnn_params: dict, fm_params: dict) -> dict:
        """Copy a trained FM's 2nd-order table into FNN's embedding (the
        intended semantics of the reference's frozen-constant load)."""
        out = dict(fnn_params)
        out["emb"] = dict(out["emb"])
        out["emb"]["embedding"] = fm_params["v"]["embedding"]
        return out


class CCPMModel(_EmbedBase):
    """Conv + k-max-pool stack → MLP (reference CCPMLayer,
    3.DCN/CustomLayers.py:680-725)."""

    num_filters: Sequence[int] = (4, 4)
    kernel_widths: Sequence[int] = (6, 5)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self.embed(inputs)
        feats = CCPM(
            tuple(self.num_filters), tuple(self.kernel_widths), dtype=self.dtype, name="ccpm"
        )(emb)
        h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(feats, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)


class FGCNNModel(_EmbedBase):
    """FGCNN: conv-generated features concatenated with raw embeddings, then
    pairwise interactions + MLP (reference FGCNNLayer,
    3.DCN/CustomLayers.py:775-822)."""

    num_filters: Sequence[int] = (8, 10)
    kernel_widths: Sequence[int] = (7, 7)
    pool_widths: Sequence[int] = (2, 2)
    new_maps: Sequence[int] = (3, 3)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self.embed(inputs)
        generated = FGCNN(
            tuple(self.num_filters),
            tuple(self.kernel_widths),
            tuple(self.pool_widths),
            tuple(self.new_maps),
            dtype=self.dtype,
            name="fgcnn",
        )(emb)
        all_fields = jnp.concatenate([emb, generated], axis=1)
        cross = fm_second_order(all_fields, reduce_dim=False)
        b = emb.shape[0]
        x = jnp.concatenate([all_fields.reshape(b, -1), cross], axis=-1)
        h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(x, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)


class AFM(_EmbedBase):
    """Attentional FM (reference AttentionalFactorizationMachine,
    3.DCN/CustomLayers.py:856-885)."""

    attention_dim: int = 16

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)
        linear = jnp.sum(
            LinearEmbedding(self.vocab_size, mesh=self.mesh, name="w")(ids), axis=1
        )
        att = AFMInteraction(self.attention_dim, dtype=self.dtype, name="afm")(emb)
        logit = nn.Dense(1, use_bias=False, dtype=self.dtype, name="p")(att).reshape(-1)
        return binary_output(linear + logit)


class FiBiNet(_EmbedBase):
    """SENet-reweighted + bilinear interactions → MLP
    (reference FiBiNetLayer, 3.DCN/CustomLayers.py:888-951)."""

    bilinear_mode: str = "all"
    reduction: int = 3

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self.embed(inputs)
        b = emb.shape[0]
        p1 = BilinearInteraction(self.bilinear_mode, dtype=self.dtype, name="bilinear_raw")(emb)
        if self.bilinear_mode == "all":
            # SENet → bilinear fused in one Pallas kernel on TPU
            p2 = SENetBilinear(self.reduction, dtype=self.dtype, name="senet_bilinear")(emb)
        else:
            se = SENet(self.reduction, dtype=self.dtype, name="senet")(emb)
            p2 = BilinearInteraction(self.bilinear_mode, dtype=self.dtype, name="bilinear_se")(se)
        x = jnp.concatenate([p1.reshape(b, -1), p2.reshape(b, -1)], axis=-1)
        h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(x, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)


class AutoInt(_EmbedBase):
    """Multi-head self-attention over field embeddings; continuous features
    become value-scaled learned embeddings
    (reference AutoIntLayer, 3.DCN/CustomLayers.py:1070-1139)."""

    num_attention_layers: int = 2
    num_heads: int = 2
    head_dim: int = 8

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = self.embed(inputs)  # (B, F, D)
        cont = stack_continuous(inputs, self.continuous_names)
        if cont is not None:
            cont_emb = self.param(
                "cont_emb",
                nn.initializers.glorot_uniform(),
                (len(self.continuous_names), self.embed_dim),
                jnp.float32,
            ).astype(emb.dtype)
            scaled = cont[..., None].astype(emb.dtype) * cont_emb[None, :, :]
            emb = jnp.concatenate([emb, scaled], axis=1)
        x = emb
        for i in range(self.num_attention_layers):
            x = MultiHeadAttention(
                num_heads=self.num_heads,
                head_dim=self.head_dim,
                dtype=self.dtype,
                name=f"mha_{i}",
            )(x, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(x.reshape(x.shape[0], -1))
        return binary_output(logit)
