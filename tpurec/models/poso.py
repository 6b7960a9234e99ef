"""Personalization-gate models: POSO (for MLP / MHA / MMOE) and PEPNet
(chapter 10 of the reference, 10.POSO/CustomLayers.py).

POSO counteracts the "user cold start dominance" problem by modulating every
module with a gate computed from personalization features (user id/activity
group): gate = 2·sigmoid(MLP(pc)) ∈ [0,2] (reference GateNULayer :76-89).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.lax import stop_gradient
from jax.sharding import Mesh

from tpurec.embedding.modules import SharedEmbedding
from tpurec.models.base import Inputs, Outputs, binary_output, stack_ids
from tpurec.ops.attention import MultiHeadAttention
from tpurec.ops.mlp import MLP


class GateNU(nn.Module):
    """gate = scale·sigmoid(W2·relu(W1·pc)) with scale=2 (reference
    10.POSO/CustomLayers.py:76-89)."""

    out_dim: int
    hidden_dim: int = 32
    scale: float = 2.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, pc: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(pc))
        return self.scale * nn.sigmoid(nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(h))


class PosoMLP(nn.Module):
    """Dense stack with per-layer POSO gates (reference PosoForMLPLayer,
    10.POSO/CustomLayers.py:92-119)."""

    hidden_dims: Sequence[int]
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, pc: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, width in enumerate(self.hidden_dims):
            x = nn.relu(nn.Dense(width, dtype=self.dtype, name=f"dense_{i}")(x))
            gate = GateNU(width, dtype=self.dtype, name=f"gate_{i}")(pc)
            x = x * gate
        return x


class _PosoBase(nn.Module):
    feature_names: Sequence[str]
    vocab_size: int
    gate_features: Sequence[str] = ()  # personalization inputs; default: first feature
    embed_dim: int = 8
    hidden_dims: Sequence[int] = (64, 32)
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    def _embed(self, inputs):
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )
        ids = stack_ids(inputs, self.feature_names)
        gate_names = list(self.gate_features) or [self.feature_names[0]]
        pc = emb(stack_ids(inputs, gate_names))
        return emb(ids), pc.reshape(pc.shape[0], -1)


class PosoMLPModel(_PosoBase):
    """Binary ranking with a POSO-gated MLP trunk."""

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb, pc = self._embed(inputs)
        x = emb.reshape(emb.shape[0], -1)
        h = PosoMLP(self.hidden_dims, dtype=self.dtype, name="poso_mlp")(x, pc, train=train)
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)


class PosoMHAModel(_PosoBase):
    """Self-attention over fields with POSO-gated K and V
    (reference PosoForMHALayer, 10.POSO/CustomLayers.py:161-221): the K
    projection is gated per-dim; V is a mixture of n_v candidate value
    projections weighted by a gate."""

    num_heads: int = 2
    n_value_candidates: int = 2

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb, pc = self._embed(inputs)
        b, f, d = emb.shape
        k_gate = GateNU(d, dtype=self.dtype, name="k_gate")(pc)  # (B, D)
        keys = emb * k_gate[:, None, :]
        v_cands = [
            nn.Dense(d, dtype=self.dtype, name=f"v_proj_{i}")(emb)
            for i in range(self.n_value_candidates)
        ]
        v_gate = nn.softmax(
            GateNU(self.n_value_candidates, scale=1.0, dtype=self.dtype, name="v_gate")(pc).astype(jnp.float32),
            axis=-1,
        )
        values = sum(
            v_cands[i] * v_gate[:, i, None, None].astype(emb.dtype)
            for i in range(self.n_value_candidates)
        )
        # explicit Q/K/V attention: Q = raw fields, K = POSO-gated, V = mixed
        from tpurec.ops.attention import scaled_dot_attention

        hds = self.num_heads
        dh = max(1, d // hds)
        proj = lambda x, name: nn.Dense(hds * dh, use_bias=False, dtype=self.dtype, name=name)(
            x
        ).reshape(b, f, hds, dh).transpose(0, 2, 1, 3)
        att = scaled_dot_attention(
            proj(emb, "q"), proj(keys, "k"), proj(values, "v")
        ).transpose(0, 2, 1, 3).reshape(b, f, hds * dh)
        att = nn.LayerNorm(dtype=self.dtype, name="ln")(
            nn.Dense(d, dtype=self.dtype, name="out")(att) + emb
        )
        h = MLP(self.hidden_dims, dtype=self.dtype, name="mlp")(
            att.reshape(b, -1), train=train
        )
        logit = nn.Dense(1, dtype=self.dtype, name="head")(h)
        return binary_output(logit)


class PosoMMOEModel(_PosoBase):
    """MMOE whose expert outputs are scaled by a personalization GateNU
    (reference PosoForMMOELayer, 10.POSO/CustomLayers.py:224-368)."""

    task_names: Sequence[str] = ("ctr", "cvr")
    num_experts: int = 4
    expert_dims: Sequence[int] = (64, 32)
    tower_dims: Sequence[int] = (32,)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        from tpurec.models.multitask import ExpertBank

        emb, pc = self._embed(inputs)
        x = emb.reshape(emb.shape[0], -1)
        experts = ExpertBank(self.num_experts, self.expert_dims, dtype=self.dtype, name="experts")(
            x, train=train
        )  # (B, E, H)
        poso_gate = GateNU(self.num_experts, dtype=self.dtype, name="poso_gate")(pc)
        experts = experts * poso_gate[..., None]
        out: Dict[str, jnp.ndarray] = {}
        for task in self.task_names:
            gate = nn.Dense(self.num_experts, dtype=self.dtype, name=f"{task}_gate")(x)
            gate = nn.softmax(gate.astype(jnp.float32), -1).astype(experts.dtype)
            mixed = jnp.einsum("be,beh->bh", gate, experts)
            h = MLP(self.tower_dims, dtype=self.dtype, name=f"{task}_tower")(mixed, train=train)
            logit = nn.Dense(1, dtype=self.dtype, name=f"{task}_head")(h).reshape(-1).astype(jnp.float32)
            out[f"{task}_logit"] = logit
            out[f"{task}_output"] = nn.sigmoid(logit)
        return out


class PEPNet(_PosoBase):
    """Parameter & embedding personalized network (reference PEPNetLayer,
    10.POSO/CustomLayers.py:371-462): EPNet applies per-field embedding gates
    driven by id features (:454-457); PPNet stops gradients into the main
    embedding and runs POSO-gated task towers (:458-461)."""

    task_names: Sequence[str] = ("ctr", "cvr")
    tower_dims: Sequence[int] = (64, 32)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        emb, pc = self._embed(inputs)
        b, f, d = emb.shape
        # EPNet: per-field scalar gates on the embedding
        ep_gate = GateNU(f, dtype=self.dtype, name="ep_gate")(pc)
        ep_emb = emb * ep_gate[:, :, None]
        x = ep_emb.reshape(b, -1)
        # PPNet: personalized towers on a gradient-stopped view
        x_sg = stop_gradient(x)
        out: Dict[str, jnp.ndarray] = {}
        for task in self.task_names:
            h = PosoMLP(self.tower_dims, dtype=self.dtype, name=f"{task}_pptower")(
                x_sg, pc, train=train
            )
            base = MLP(self.tower_dims, dtype=self.dtype, name=f"{task}_base")(x, train=train)
            logit = nn.Dense(1, dtype=self.dtype, name=f"{task}_head")(
                jnp.concatenate([base, h], -1)
            ).reshape(-1).astype(jnp.float32)
            out[f"{task}_logit"] = logit
            out[f"{task}_output"] = nn.sigmoid(logit)
        return out
