"""Capsule dynamic routing for multi-interest extraction (MIND / ComiRec-DR).

Reference: MultiInterestExtractorLayer (6.MIND/CustomLayers.py:62-138) —
shared bilinear map S, non-trainable routing logits, masked softmax routing
iterations with squash; ComiRecDynamicRoutingLayer (:528-594) uses
per-capsule-per-position weights and zero-initialized logits.

Routing runs as a fixed-iteration fori-style Python loop (3 iterations is
static) of einsums — XLA unrolls and fuses; no dynamic shapes. The
per-sample valid-capsule count (max(1, min(K, ceil(log2 len))),
6.MIND/CustomLayers.py:214-218) becomes a static-K capsule mask.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def squash(x: jnp.ndarray, axis: int = -1, eps: float = 1e-9) -> jnp.ndarray:
    """v = |x|²/(1+|x|²) · x/|x| (capsule nonlinearity)."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return (sq / (1.0 + sq)) * x * jax.lax.rsqrt(sq + eps)


def valid_capsule_mask(seq_len: jnp.ndarray, max_capsules: int) -> jnp.ndarray:
    """(B, K) mask with K_u = max(1, min(K, ceil(log2 len_u))) valid capsules
    (reference log2 rule, 6.MIND/CustomLayers.py:214-218)."""
    k_u = jnp.ceil(jnp.log2(jnp.maximum(seq_len.astype(jnp.float32), 1.0)))
    k_u = jnp.clip(k_u, 1, max_capsules)  # (B,)
    idx = jnp.arange(max_capsules)[None, :]
    return (idx < k_u[:, None]).astype(jnp.float32)


class CapsuleRouting(nn.Module):
    """B-interest dynamic routing.

    behavior (B, L, D), seq mask (B, L) → capsules (B, K, D), capsule mask (B, K).

    mode 'shared'  — one bilinear map S (MIND)
    mode 'per_pos' — per-capsule-per-position weights (ComiRec-DR)
    """

    num_capsules: int
    dim: int
    num_iterations: int = 3
    mode: str = "shared"
    max_length: int = 0  # required for 'per_pos'
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, behavior: jnp.ndarray, mask: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, l, d = behavior.shape
        k = self.num_capsules
        if self.mode == "shared":
            s = self.param("S", nn.initializers.glorot_uniform(), (d, self.dim), jnp.float32)
            from tpurec.ops.pallas.kernels import (
                capsule_routing_fused,
                fused_wins,
                pallas_available,
            )

            # phase-aware: capsule_train measures 0.87x even with the fused
            # backward kernel (today's XLA VJP closed the gap) — reference
            # math during training, the 6.6x fused forward at inference
            if pallas_available() and fused_wins("capsule"):
                # all routing iterations fused in one Pallas kernel: u_hat
                # stays VMEM-resident instead of being re-read from HBM by
                # every iteration's two einsums (same math + VJP — parity
                # pinned by tests/test_pallas.py::TestCapsuleRoutingKernel)
                logits0 = jnp.broadcast_to(
                    jax.random.normal(jax.random.key(7), (1, k, l), jnp.float32),
                    (b, k, l),
                )
                capsules = capsule_routing_fused(
                    behavior.astype(jnp.float32), mask.astype(jnp.float32),
                    s, logits0, self.num_iterations,
                ).astype(behavior.dtype)
                seq_len = jnp.sum(mask, axis=-1)
                return capsules, valid_capsule_mask(seq_len, k)
            u_hat = jnp.einsum("bld,de->ble", behavior, s.astype(behavior.dtype))
            u_hat = jnp.broadcast_to(u_hat[:, None], (b, k, l, self.dim))
        else:  # per-capsule-per-position maps (ComiRec-DR, :547-549)
            w = self.param(
                "W", nn.initializers.glorot_uniform(), (k, l, d, self.dim), jnp.float32
            )
            u_hat = jnp.einsum("bld,klde->bkle", behavior, w.astype(behavior.dtype))
        # fixed random (non-trainable) routing init for 'shared', zeros for DR
        if self.mode == "shared":
            logits = jax.random.normal(jax.random.key(7), (1, k, l), jnp.float32)
            logits = jnp.broadcast_to(logits, (b, k, l))
        else:
            logits = jnp.zeros((b, k, l), jnp.float32)
        seq_mask = mask.astype(bool)[:, None, :]  # (B, 1, L)
        u_sg = jax.lax.stop_gradient(u_hat)
        capsules = None
        for it in range(self.num_iterations):
            masked_logits = jnp.where(seq_mask, logits, -1e9)
            w_route = jax.nn.softmax(masked_logits, axis=1)  # over capsules
            w_route = w_route * mask[:, None, :]
            src = u_hat if it == self.num_iterations - 1 else u_sg
            z = jnp.einsum("bkl,bkle->bke", w_route.astype(src.dtype), src)
            capsules = squash(z.astype(jnp.float32)).astype(src.dtype)
            if it < self.num_iterations - 1:
                logits = logits + jnp.einsum(
                    "bke,bkle->bkl", capsules.astype(jnp.float32), u_sg.astype(jnp.float32)
                )
        seq_len = jnp.sum(mask, axis=-1)
        return capsules, valid_capsule_mask(seq_len, k)


class LabelAwareAttention(nn.Module):
    """Pick/blend capsules by similarity to the target item:
    w ∝ softmax((capsule·target)^pow over valid capsules); user vec = Σ w·caps
    (reference LabelAwareAttention, 6.MIND/CustomLayers.py:141-158)."""

    power: float = 2.0

    @nn.compact
    def __call__(
        self,
        capsules: jnp.ndarray,  # (B, K, D)
        capsule_mask: jnp.ndarray,  # (B, K)
        target: jnp.ndarray,  # (B, D)
    ) -> jnp.ndarray:
        scores = jnp.einsum("bkd,bd->bk", capsules.astype(jnp.float32), target.astype(jnp.float32))
        scores = jnp.sign(scores) * jnp.power(jnp.abs(scores), self.power)
        scores = jnp.where(capsule_mask.astype(bool), scores, -1e9)
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bk,bkd->bd", w.astype(capsules.dtype), capsules)
