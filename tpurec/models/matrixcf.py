"""Chapter-1 models: MatrixCF and NCF (Neural Collaborative Filtering).

Reference: 1.MatrixCF/ModelZoo.py — MatrixCF (:10-70) shares one embedding
table between user and item ids and scores by cosine mapped to [0,1];
NCF (:73-148) keeps separate MF and MLP embeddings and merges the
elementwise-product path with the MLP path.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from tpurec.embedding.modules import SharedEmbedding
from tpurec.models.base import Inputs, Outputs, binary_output, cosine_similarity
from tpurec.ops.mlp import MLP


class MatrixCF(nn.Module):
    """Shared-table matrix CF: cosine(u_emb, i_emb) → [0, 1]
    (reference 1.MatrixCF/ModelZoo.py:27-28)."""

    vocab_size: int
    embed_dim: int = 16
    user_key: str = "user_id"
    item_key: str = "item_id"
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )
        u = emb(inputs[self.user_key].reshape(-1))
        i = emb(inputs[self.item_key].reshape(-1))
        sim = cosine_similarity(u.astype(jnp.float32), i.astype(jnp.float32))
        return {
            "output": 0.5 * (sim + 1.0),
            "user_embedding": u,
            "item_embedding": i,
        }


class NCF(nn.Module):
    """Neural CF: GMF path (separate MF embeddings, elementwise product) ∥
    MLP path (separate embeddings, concat → MLP), merged → sigmoid
    (reference 1.MatrixCF/ModelZoo.py:95-103)."""

    vocab_size: int
    mf_dim: int = 16
    mlp_dim: int = 16
    hidden_dims: Sequence[int] = (64, 32, 16)
    user_key: str = "user_id"
    item_key: str = "item_id"
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        u_ids = inputs[self.user_key].reshape(-1)
        i_ids = inputs[self.item_key].reshape(-1)
        mf = SharedEmbedding(self.vocab_size, self.mf_dim, dtype=self.dtype, mesh=self.mesh, name="mf_emb")
        mlp = SharedEmbedding(self.vocab_size, self.mlp_dim, dtype=self.dtype, mesh=self.mesh, name="mlp_emb")
        gmf = mf(u_ids) * mf(i_ids)  # (B, mf_dim)
        h = jnp.concatenate([mlp(u_ids), mlp(i_ids)], axis=-1)
        h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(h, train=train)
        merged = jnp.concatenate([gmf, h], axis=-1)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(merged)
        return binary_output(logit)
