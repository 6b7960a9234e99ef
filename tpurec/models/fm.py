"""FM family: FM, DSSM (single & two-tower), DeepFM, Wide&Deep, FFM, FwFM,
PNN (inner/outer), ONN — capability parity with chapter 2 of the reference
(2.FM/CustomLayers.py), re-designed around the shared embedding engine and
vectorized interaction ops.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from tpurec.embedding.modules import (
    FieldAwareEmbedding,
    LinearEmbedding,
    SharedEmbedding,
)
from tpurec.models.base import (
    Inputs,
    Outputs,
    binary_output,
    cosine_similarity,
    stack_continuous,
    stack_ids,
)
from tpurec.ops.interactions import (
    FwFMInteraction,
    InnerProductTower,
    OuterProductTower,
    field_aware_products,
    fm_second_order,
)
from tpurec.ops.mlp import MLP


class FM(nn.Module):
    """Factorization Machine: bias + order-1 w-embedding + ½((Σv)²−Σv²)
    (reference FMRankingLayer, 2.FM/CustomLayers.py:87-157)."""

    feature_names: Sequence[str]
    vocab_size: int
    embed_dim: int = 8
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        bias = self.param("bias", nn.initializers.zeros_init(), (), jnp.float32)
        order1 = LinearEmbedding(self.vocab_size, mesh=self.mesh, name="w")(ids)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="v"
        )(ids)
        logit = bias + jnp.sum(order1, axis=1) + fm_second_order(emb)
        return binary_output(logit) | {"embeddings": emb}


class DSSMTower(nn.Module):
    """One DSSM tower: embed → flatten → MLP → projection
    (reference DSSMSingleTowerLayer, 2.FM/CustomLayers.py:159-206)."""

    feature_names: Sequence[str]
    vocab_size: int
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    output_dim: int = 8
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> jnp.ndarray:
        ids = stack_ids(inputs, self.feature_names)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)
        flat = emb.reshape(emb.shape[0], -1)
        h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(flat, train=train)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="proj")(h)


class DSSMSingleRanking(nn.Module):
    """Single-tower ranking head over all features ('dssm_single' registry
    choice, 2.FM/ModelManager.py:64-66)."""

    feature_names: Sequence[str]
    vocab_size: int
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        vec = DSSMTower(
            feature_names=self.feature_names,
            vocab_size=self.vocab_size,
            embed_dim=self.embed_dim,
            hidden_dims=self.hidden_dims,
            output_dim=self.hidden_dims[-1],
            dtype=self.dtype,
            mesh=self.mesh,
            name="tower",
        )(inputs, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(nn.relu(vec))
        return binary_output(logit)


class DSSMTwoTowerRetrieval(nn.Module):
    """Two-tower retrieval: cosine(u, i) mapped to [0, 1]
    (reference DSSMTwoTowerRetrievalLayer, 2.FM/CustomLayers.py:208-239).
    Outputs tower embeddings for the offline indexer (SURVEY §1-L4)."""

    user_features: Sequence[str]
    item_features: Sequence[str]
    vocab_size: int
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    output_dim: int = 8
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    def setup(self):
        common = dict(
            vocab_size=self.vocab_size,
            embed_dim=self.embed_dim,
            hidden_dims=self.hidden_dims,
            output_dim=self.output_dim,
            dtype=self.dtype,
            mesh=self.mesh,
        )
        self.u_tower = DSSMTower(feature_names=self.user_features, **common)
        self.i_tower = DSSMTower(feature_names=self.item_features, **common)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(2.0), (), jnp.float32
        )
        self.logit_bias = self.param(
            "logit_bias", nn.initializers.zeros_init(), (), jnp.float32
        )

    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        u = self.u_tower(inputs, train=train)
        i = self.i_tower(inputs, train=train)
        sim = cosine_similarity(u.astype(jnp.float32), i.astype(jnp.float32))
        # Learned temperature + base-rate bias for the BCE loss. The
        # reference trains BCE directly on the bounded 0.5*(1+cos) output
        # (2.FM/ModelManager.py init_loss + CustomLayers.py:233-239), which
        # forces cosine toward ±1 to express confident probabilities — a
        # gradient pathology on skewed CTR data. logit = softplus(s)·cos + b
        # is strictly monotone in cos, so ranking (AUC, top-k retrieval) is
        # identical to the reference's output; only optimization improves.
        scale = nn.softplus(self.logit_scale)
        return {
            "output": 0.5 * (sim + 1.0),
            "logit": scale * sim + self.logit_bias,
            "user_embedding": u,
            "item_embedding": i,
        }

    def user_embedding(self, inputs: Inputs) -> jnp.ndarray:
        return self.u_tower(inputs, train=False)

    def item_embedding(self, inputs: Inputs) -> jnp.ndarray:
        return self.i_tower(inputs, train=False)


class DeepFM(nn.Module):
    """FM logit + deep MLP logit on flattened embeddings, summed → sigmoid
    (reference DeepFMRankingLayer, 2.FM/CustomLayers.py:241-308)."""

    feature_names: Sequence[str]
    vocab_size: int
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        bias = self.param("bias", nn.initializers.zeros_init(), (), jnp.float32)
        order1 = LinearEmbedding(self.vocab_size, mesh=self.mesh, name="w")(ids)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="v"
        )(ids)
        fm_logit = bias + jnp.sum(order1, axis=1) + fm_second_order(emb)
        deep = MLP(self.hidden_dims, dtype=self.dtype, name="deep")(
            emb.reshape(emb.shape[0], -1), train=train
        )
        deep_logit = nn.Dense(1, dtype=self.dtype, name="deep_head")(deep)
        return binary_output(fm_logit + deep_logit.reshape(-1))


class WideAndDeep(nn.Module):
    """Wide (continuous features, linear) + deep (embeddings → MLP) — the
    *working* chapter-3 version where continuous features form the wide side
    (3.DCN/CustomLayers.py:93-150; the chapter-2 variant deliberately raises,
    2.FM/CustomLayers.py:325 — not replicated)."""

    feature_names: Sequence[str]
    vocab_size: int
    continuous_names: Sequence[str] = ()
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)
        deep = MLP(self.hidden_dims, dtype=self.dtype, name="deep")(
            emb.reshape(emb.shape[0], -1), train=train
        )
        deep_logit = nn.Dense(1, dtype=self.dtype, name="deep_head")(deep).reshape(-1)
        cont = stack_continuous(inputs, self.continuous_names)
        if cont is not None:
            wide_logit = nn.Dense(1, dtype=self.dtype, name="wide")(cont).reshape(-1)
        else:
            wide_logit = 0.0
        return binary_output(deep_logit + wide_logit)


class FFM(nn.Module):
    """Field-aware FM: Σ_{i<j} <v_{i,j}, v_{j,i}> + order-1 + bias
    (vectorized reference FFMLayer, 2.FM/CustomLayers.py:465-497)."""

    feature_names: Sequence[str]
    vocab_size: int
    embed_dim: int = 4
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        num_fields = len(self.feature_names)
        bias = self.param("bias", nn.initializers.zeros_init(), (), jnp.float32)
        order1 = LinearEmbedding(self.vocab_size, mesh=self.mesh, name="w")(ids)
        fa = FieldAwareEmbedding(
            self.vocab_size, num_fields, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="v"
        )(ids)
        cross = jnp.sum(field_aware_products(fa), axis=(1, 2))
        return binary_output(bias + jnp.sum(order1, axis=1) + cross)


class FwFM(nn.Module):
    """Field-weighted FM: learned scalar per pair on shared-embedding inner
    products (reference FwFMLayer, 2.FM/CustomLayers.py:500-533)."""

    feature_names: Sequence[str]
    vocab_size: int
    embed_dim: int = 8
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        bias = self.param("bias", nn.initializers.zeros_init(), (), jnp.float32)
        order1 = LinearEmbedding(self.vocab_size, mesh=self.mesh, name="w")(ids)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="v"
        )(ids)
        cross = FwFMInteraction(name="fwfm")(emb)
        return binary_output(bias + jnp.sum(order1, axis=1) + cross)


class PNN(nn.Module):
    """Product-based NN: [flat emb ∥ inner or kernel-outer products] → MLP
    (reference PNNLayer/IpnLayer/OpnLayer, 2.FM/CustomLayers.py:685-792)."""

    feature_names: Sequence[str]
    vocab_size: int
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    product_type: str = "inner"  # 'inner' | 'outer'
    kernel_type: str = "mat"
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)
        if self.product_type == "inner":
            sig = InnerProductTower(name="product")(emb)
        else:
            sig = OuterProductTower(
                kernel_type=self.kernel_type, dtype=self.dtype, name="product"
            )(emb)
        h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(sig, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)


class ONN(nn.Module):
    """Operation-aware NN (NFFM): field-aware pair products concatenated with
    the flattened shared embeddings → MLP (vectorized reference
    ParralledOnnLayer, 2.FM/CustomLayers.py:957-1006)."""

    feature_names: Sequence[str]
    vocab_size: int
    embed_dim: int = 4
    hidden_dims: Sequence[int] = (64, 32)
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        ids = stack_ids(inputs, self.feature_names)
        b = ids.shape[0]
        num_fields = len(self.feature_names)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)
        fa = FieldAwareEmbedding(
            self.vocab_size, num_fields, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="fa"
        )(ids)
        pairs = field_aware_products(fa).reshape(b, -1)
        sig = jnp.concatenate([emb.reshape(b, -1), pairs], axis=-1)
        h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(sig, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)
