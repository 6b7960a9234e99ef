"""Attention ops: masked scaled-dot MHA and target attention (DIN family).

One MHA implementation serves AutoInt's field self-attention
(3.DCN/CustomLayers.py:1012-1067), the sequence transformers of DSIN/DMT
(5.DIN/CustomLayers.py:519-538, 8.DMR/CustomLayers.py:580-726), SIM/ETA's
interest extractors (7.SIM/CustomLayers.py:188-196) and POSO's gated MHA.
Masks are additive −inf on the logits; softmax runs in fp32.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

_NEG_INF = -1e9


def scaled_dot_attention(
    q: jnp.ndarray,  # (B, H, Lq, Dh)
    k: jnp.ndarray,  # (B, H, Lk, Dh)
    v: jnp.ndarray,  # (B, H, Lk, Dv)
    mask: Optional[jnp.ndarray] = None,  # broadcastable to (B, H, Lq, Lk); 1=keep
) -> jnp.ndarray:
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask.astype(bool), logits, _NEG_INF)
    weights = nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


def expand_mask(
    mask: Optional[jnp.ndarray], q_len: int, k_len: int
) -> Optional[jnp.ndarray]:
    """Normalize a (B, Lk) key mask or (B, Lq, Lk) pair mask to (B, 1, Lq, Lk)."""
    if mask is None:
        return None
    if mask.ndim == 2:
        mask = mask[:, None, :] * jnp.ones((1, q_len, 1), mask.dtype)
    return mask[:, None, :, :]


class MultiHeadAttention(nn.Module):
    """Masked multi-head attention; self-attention when kv is None."""

    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None  # None → q's feature dim
    use_residual: bool = True
    use_layer_norm: bool = True
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,  # (B, Lq, D)
        kv: Optional[jnp.ndarray] = None,  # (B, Lk, D)
        mask: Optional[jnp.ndarray] = None,  # (B, Lk) or (B, Lq, Lk)
        train: bool = False,
    ) -> jnp.ndarray:
        from tpurec.core.mesh import MODEL_AXIS

        kv = q if kv is None else kv
        b, lq, d = q.shape
        lk = kv.shape[1]
        h, dh = self.num_heads, self.head_dim
        # Megatron attention TP: q/k/v projections column-sharded over
        # 'model' (heads split across devices), output projection row-sharded
        # — one reduce after the out matmul (SURVEY §2.10 TP row); no-op on a
        # 1-device 'model' axis
        proj = lambda x, name: nn.Dense(
            h * dh, use_bias=False, dtype=self.dtype,
            kernel_init=nn.with_partitioning(
                nn.linear.default_kernel_init, (None, MODEL_AXIS)
            ),
            name=name,
        )(x)
        qh = proj(q, "q").reshape(b, lq, h, dh).transpose(0, 2, 1, 3)
        kh = proj(kv, "k").reshape(b, lk, h, dh).transpose(0, 2, 1, 3)
        vh = proj(kv, "v").reshape(b, lk, h, dh).transpose(0, 2, 1, 3)
        out = scaled_dot_attention(qh, kh, vh, expand_mask(mask, lq, lk))
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, h * dh)
        out_dim = self.out_dim or d
        out = nn.Dense(
            out_dim, dtype=self.dtype,
            kernel_init=nn.with_partitioning(
                nn.linear.default_kernel_init, (MODEL_AXIS, None)
            ),
            name="out",
        )(out)
        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        if self.use_residual and out_dim == d:
            out = out + q
        if self.use_layer_norm:
            out = nn.LayerNorm(dtype=self.dtype, name="ln")(out)
        return out


class DinTargetAttention(nn.Module):
    """DIN activation-unit target attention over a behavior sequence.

    Per step t: score_t = MLP([q, q−k_t, k_t, q⊙k_t]) → scalar; masked scores
    weight a sum-pool over the sequence. The reference evaluates its
    activation MLP per timestep under ``tf.vectorized_map``
    (5.DIN/CustomLayers.py:163-180, :270) and includes a flattened outer
    product in the feature set; here the whole (B, L) score grid is one
    batched MLP over broadcast features, and the D² outer product is replaced
    by the elementwise product (its diagonal) by default — set
    ``use_outer_product=True`` for the full cross term.
    Returns (pooled (B, D), scores (B, L)).
    """

    hidden_dims: tuple = (36,)
    use_outer_product: bool = False
    activation: str = "prelu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, D)
        keys: jnp.ndarray,  # (B, L, D)
        mask: Optional[jnp.ndarray] = None,  # (B, L) 1=real step
        train: bool = False,
    ):
        from tpurec.ops.mlp import MLP

        b, l, d = keys.shape
        # Fused-kernel-compatible form: single relu hidden layer, no outer
        # product → explicit (4D, H) params shared by the Pallas kernel and
        # the XLA reference (tpurec.ops.pallas.kernels.din_attention_*), so
        # checkpoints are identical across platforms.
        if (
            len(self.hidden_dims) == 1
            and self.activation in ("relu", "prelu")
            and not self.use_outer_product
        ):
            from tpurec.ops.pallas.kernels import (
                din_attention_fused,
                din_attention_reference,
                pallas_available,
            )

            h = self.hidden_dims[0]
            w1 = self.param("w1", nn.initializers.glorot_uniform(), (4 * d, h), jnp.float32)
            b1 = self.param("b1", nn.initializers.zeros_init(), (h,), jnp.float32)
            w2 = self.param("w2", nn.initializers.glorot_uniform(), (h, 1), jnp.float32)[:, 0]
            alpha = (
                self.param("alpha", nn.initializers.constant(0.25), (h,), jnp.float32)
                if self.activation == "prelu"
                else None
            )
            m = mask if mask is not None else jnp.ones((b, l), jnp.float32)
            fn = din_attention_fused if pallas_available() else din_attention_reference
            pooled, scores = fn(
                query.astype(jnp.float32), keys.astype(jnp.float32), m, w1, b1, w2, alpha
            )
            return pooled.astype(keys.dtype), scores
        q = jnp.broadcast_to(query[:, None, :], (b, l, d))
        feats = [q, q - keys, keys, q * keys]
        if self.use_outer_product:
            outer = jnp.einsum("bld,ble->blde", q, keys).reshape(b, l, d * d)
            feats.append(outer)
        x = jnp.concatenate(feats, axis=-1)
        x = MLP(
            tuple(self.hidden_dims) + (1,),
            activation=self.activation,
            out_activation="linear",
            dtype=self.dtype,
            name="act_mlp",
        )(x, train=train)
        scores = x.reshape(b, l).astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask.astype(bool), scores, 0.0)
        pooled = jnp.einsum("bl,bld->bd", scores.astype(keys.dtype), keys)
        return pooled, scores
