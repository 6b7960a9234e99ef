"""Convolutional feature extractors: CCPM and FGCNN blocks, k-max pooling.

Reference: KMaxPool/CCPM (3.DCN/CustomLayers.py:621-725), FGCNN (:728-822).
Convs run over the (fields, embed_dim) plane so XLA can lower them onto the
MXU as implicit matmuls.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def k_max_pool(x: jnp.ndarray, k: int, axis: int = 1) -> jnp.ndarray:
    """Top-k values along ``axis`` sorted descending (reference KMaxPool,
    3.DCN/CustomLayers.py:621-637 — tf.nn.top_k semantics)."""
    top = jnp.sort(x, axis=axis)
    top = jnp.flip(top, axis=axis)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, k)
    return top[tuple(idx)]


class CCPMBlock(nn.Module):
    """Conv over the field axis + dynamic k-max pooling
    (reference CCPMBaseLayer, 3.DCN/CustomLayers.py:640-677)."""

    num_filters: int
    kernel_width: int
    pool_k: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, F, D, C)
        x = nn.Conv(
            self.num_filters,
            kernel_size=(self.kernel_width, 1),
            padding="SAME",
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.tanh(x)
        return k_max_pool(x, self.pool_k, axis=1)


class CCPM(nn.Module):
    """Stacked CCPM blocks with the paper's per-level k schedule
    (reference CCPMLayer, 3.DCN/CustomLayers.py:680-725)."""

    num_filters: Sequence[int] = (4, 4)
    kernel_widths: Sequence[int] = (6, 5)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        # emb: (B, F, D)
        b, f, d = emb.shape
        x = emb[..., None]  # (B, F, D, 1)
        n = len(self.num_filters)
        for i, (filters, width) in enumerate(zip(self.num_filters, self.kernel_widths)):
            # k_i = max(1, (1 - ((i+1)/n)^(n-i-1)) * F) per the CCPM paper
            if i == n - 1:
                k = 3
            else:
                k = max(3, int((1 - ((i + 1) / n) ** (n - i - 1)) * f))
            k = min(k, x.shape[1])
            x = CCPMBlock(filters, width, k, dtype=self.dtype, name=f"block_{i}")(x)
        return x.reshape(b, -1)


class FGCNNBlock(nn.Module):
    """Conv + max-pool + dense recombination producing generated features
    (reference FGCNNBaseLayer, 3.DCN/CustomLayers.py:728-772)."""

    num_filters: int
    kernel_width: int
    pool_width: int
    new_maps: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: (B, F, D, C) → (pooled (B, F', D, filters), new features (B, F'*new_maps, D))
        h = nn.Conv(
            self.num_filters,
            kernel_size=(self.kernel_width, 1),
            padding="SAME",
            dtype=self.dtype,
            name="conv",
        )(x)
        h = nn.tanh(h)
        h = nn.max_pool(h, window_shape=(self.pool_width, 1), strides=(self.pool_width, 1))
        b, f2, d, c = h.shape
        flat = h.reshape(b, f2 * d * c)
        new = nn.Dense(f2 * d * self.new_maps, dtype=self.dtype, name="recombine")(flat)
        new = nn.tanh(new).reshape(b, f2 * self.new_maps, d)
        return h, new


class FGCNN(nn.Module):
    """Stacked FGCNN blocks; returns generated features concatenated along the
    field axis (reference FGCNNLayer, 3.DCN/CustomLayers.py:775-822)."""

    num_filters: Sequence[int] = (14, 16)
    kernel_widths: Sequence[int] = (7, 7)
    pool_widths: Sequence[int] = (2, 2)
    new_maps: Sequence[int] = (3, 3)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        x = emb[..., None]
        generated = []
        for i in range(len(self.num_filters)):
            x, new = FGCNNBlock(
                self.num_filters[i],
                self.kernel_widths[i],
                self.pool_widths[i],
                self.new_maps[i],
                dtype=self.dtype,
                name=f"block_{i}",
            )(x)
            generated.append(new)
        return jnp.concatenate(generated, axis=1)  # (B, F_new, D)


class ResidualBlock(nn.Module):
    """DeepCrossing residual unit: x + MLP(x), relu on the sum
    (reference ResLayer, 3.DCN/CustomLayers.py:560-575)."""

    hidden_dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        return nn.relu(x + h)
