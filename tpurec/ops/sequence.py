"""Sequence ops: masked GRU/LSTM, the DIEN attention-gated GRU family
(AIGRU/AGRU/AUGRU), and position encodings.

The reference drives recurrence through Python-level ``tf.keras.layers.RNN``
with custom cells (5.DIN/CustomLayers.py:320-386); here every recurrence is a
single ``jax.lax.scan`` (via flax nn.scan) over the time axis — one compiled
loop, static shapes, mask-gated carries instead of dynamic lengths.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MaskedGRU(nn.Module):
    """GRU returning all hidden states; padded steps carry the previous
    state through unchanged (mask-gated carry)."""

    hidden_dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        # x: (B, L, D), mask: (B, L)
        b, l, d = x.shape
        cell = nn.GRUCell(self.hidden_dim, dtype=self.dtype, name="cell")
        carry = cell.initialize_carry(jax.random.key(0), x[:, 0].shape)

        def body(mdl, carry, inp):
            xt, mt = inp
            new_carry, y = cell(carry, xt)
            if mt is not None:
                keep = mt[:, None].astype(y.dtype)
                new_carry = jax.tree.map(
                    lambda n, o: keep * n + (1 - keep) * o, new_carry, carry
                )
                y = new_carry
            return new_carry, y

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        mask_in = mask if mask is not None else jnp.ones((b, l), x.dtype)
        _, ys = scan(self, carry, (x, mask_in))
        return ys  # (B, L, H)


class AttentionGRU(nn.Module):
    """DIEN interest-evolution recurrences (reference CustomGRUCell/DienGRU,
    5.DIN/CustomLayers.py:320-386):

      mode='augru': update gate scaled by the attention score
                    h' = (1 − a·u) ∘ h + (a·u) ∘ h̃
      mode='agru' : update gate replaced by the score
                    h' = (1 − a) ∘ h + a ∘ h̃
      mode='aigru': plain GRU over attention-scaled inputs (a ∘ x)

    Returns the final hidden state (B, H).
    """

    hidden_dim: int
    mode: str = "augru"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, L, D)
        scores: jnp.ndarray,  # (B, L) attention scores
        mask: Optional[jnp.ndarray] = None,  # (B, L)
    ) -> jnp.ndarray:
        if self.mode == "aigru":
            scaled = x * scores[..., None].astype(x.dtype)
            ys = MaskedGRU(self.hidden_dim, dtype=self.dtype, name="gru")(scaled, mask)
            return ys[:, -1]
        b, l, d = x.shape
        h_dim = self.hidden_dim
        dense = lambda name: nn.Dense(h_dim, dtype=self.dtype, name=name)
        wu, uu = dense("wu"), dense("uu")
        wr, ur = dense("wr"), dense("ur")
        wh, uh = dense("wh"), dense("uh")
        mode = self.mode

        def body(mdl, carry, inp):
            xt, at, mt = inp
            h = carry
            u = nn.sigmoid(wu(xt) + uu(h))
            r = nn.sigmoid(wr(xt) + ur(h))
            h_tilde = jnp.tanh(wh(xt) + uh(r * h))
            a = at[:, None].astype(h.dtype)
            if mode == "augru":
                gate = a * u
            else:  # 'agru'
                gate = a * jnp.ones_like(u)
            new_h = (1 - gate) * h + gate * h_tilde
            keep = mt[:, None].astype(h.dtype)
            new_h = keep * new_h + (1 - keep) * h
            return new_h, new_h

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry = jnp.zeros((b, h_dim), x.dtype)
        mask_in = mask if mask is not None else jnp.ones((b, l), x.dtype)
        final, _ = scan(self, carry, (x, scores, mask_in))
        return final


class MaskedLSTM(nn.Module):
    """Stacked unidirectional LSTM returning all top-layer states; padded
    steps carry state through unchanged (reference SDM short-term channel
    stacks LSTM(return_sequences=True) layers, 6.MIND/CustomLayers.py:334-340).
    Each layer is one lax.scan; layers are a static Python loop."""

    hidden_dim: int
    num_layers: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        m = mask if mask is not None else jnp.ones(x.shape[:2], x.dtype)
        for layer in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(
                self.hidden_dim, dtype=self.dtype, name=f"layer_{layer}"
            )
            carry = cell.initialize_carry(jax.random.key(0), x[:, 0].shape)

            def body(mdl, carry, inp):
                xt, mt = inp
                new_carry, y = cell(carry, xt)
                keep = mt[:, None].astype(y.dtype)
                new_carry = jax.tree.map(
                    lambda n, o: keep * n + (1 - keep) * o, new_carry, carry
                )
                return new_carry, keep * y

            scan = nn.scan(
                body, variable_broadcast="params", split_rngs={"params": False},
                in_axes=1, out_axes=1,
            )
            _, x = scan(self, carry, (x, m))
        return x  # (B, L, H)


class MaskedBiLSTM(nn.Module):
    """Bidirectional LSTM over a (possibly masked) sequence, concatenated
    outputs (reference DSIN BiLSTM across sessions,
    5.DIN/CustomLayers.py:594,663)."""

    hidden_dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        def run(x, mask, name):
            cell = nn.OptimizedLSTMCell(self.hidden_dim, dtype=self.dtype, name=name)
            carry = cell.initialize_carry(jax.random.key(0), x[:, 0].shape)

            def body(mdl, carry, inp):
                xt, mt = inp
                new_carry, y = cell(carry, xt)
                keep = mt[:, None].astype(y.dtype)
                new_carry = jax.tree.map(
                    lambda n, o: keep * n + (1 - keep) * o, new_carry, carry
                )
                return new_carry, keep * y

            scan = nn.scan(
                body, variable_broadcast="params", split_rngs={"params": False},
                in_axes=1, out_axes=1,
            )
            m = mask if mask is not None else jnp.ones(x.shape[:2], x.dtype)
            _, ys = scan(self, carry, (x, m))
            return ys

        fwd = run(x, mask, "fwd")
        bwd = run(
            jnp.flip(x, axis=1),
            jnp.flip(mask, axis=1) if mask is not None else None,
            "bwd",
        )
        return jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Fixed sinusoidal position table (reference ComiRec-SA positions,
    6.MIND/CustomLayers.py:625-642)."""
    pos = np.arange(length)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / dim)
    table = np.zeros((length, dim), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class LearnedPositionEmbedding(nn.Module):
    """Learned position table added to a (B, L, D) sequence (reference DMR
    position embeddings, 8.DMR/CustomLayers.py:129-133)."""

    max_length: int
    dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, length: int) -> jnp.ndarray:
        table = self.param(
            "pos", nn.initializers.normal(0.02), (self.max_length, self.dim), jnp.float32
        )
        out = table[:length]
        return out.astype(self.dtype) if self.dtype is not None else out
