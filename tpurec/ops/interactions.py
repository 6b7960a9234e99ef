"""Feature-interaction ops: the mathematical core of the FM/DCN families.

Each op documents the reference layer it reproduces (capability parity), but
the implementations are vectorized jnp/einsum forms designed for XLA fusion —
no per-pair Python loops (the reference loops over field pairs, e.g.
FFM at 2.FM/CustomLayers.py:412-421; here pair extraction is one gather and
the products are one einsum). Shapes: ``emb`` is (B, F, D) — batch, fields,
embedding dim.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpurec.ops.mlp import MLP


# ---------------------------------------------------------------------------
# stateless interactions
def fm_second_order(emb: jnp.ndarray, reduce_dim: bool = True) -> jnp.ndarray:
    """FM 2nd-order cross: 0.5 * ((Σ_f v_f)² − Σ_f v_f²).

    Reference: FMRankingLayer cross term (2.FM/CustomLayers.py:151-153).
    Returns (B,) if reduce_dim else the (B, D) bi-interaction vector
    (the NFM pooling, 3.DCN/CustomLayers.py:451-509).
    """
    if reduce_dim:
        from tpurec.ops.pallas.kernels import (
            fm_second_order_fused,
            fused_wins,
            pallas_available,
        )

        # phase-aware: the full FM train step measured SLOWER with the
        # kernel (engine_ab_results.json fm2m_dense_fmkernel 43.5 vs 42.6 ms
        # — kernel_bench's isolated 5.9x row is dispatch-dominated), so it
        # dispatches at inference only; backward (when traced) is the XLA
        # VJP of the reference math (kernels.py _fm_bwd).
        if pallas_available() and fused_wins("fm"):
            return fm_second_order_fused(emb.astype(jnp.float32)).astype(emb.dtype)
    sum_sq = jnp.square(jnp.sum(emb, axis=1))
    sq_sum = jnp.sum(jnp.square(emb), axis=1)
    cross = 0.5 * (sum_sq - sq_sum)
    return jnp.sum(cross, axis=-1) if reduce_dim else cross


def pair_indices(num_fields: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static upper-triangle (i, j) index arrays for all field pairs i<j."""
    iu, ju = np.triu_indices(num_fields, k=1)
    return iu, ju


def pairwise_products(emb: jnp.ndarray) -> jnp.ndarray:
    """Elementwise products of all field pairs → (B, P, D), P = F(F−1)/2.

    Reference: InteractionLayer (3.DCN/CustomLayers.py:825-838) and the PNN
    inner-product extraction (2.FM/CustomLayers.py:833-850).
    """
    iu, ju = pair_indices(emb.shape[1])
    return emb[:, iu, :] * emb[:, ju, :]


def inner_products(emb: jnp.ndarray) -> jnp.ndarray:
    """Pairwise inner products → (B, P). PNN 'inner' mode
    (2.FM/CustomLayers.py:601-624 / IpnLayer :775-783)."""
    return jnp.sum(pairwise_products(emb), axis=-1)


def outer_products(emb: jnp.ndarray) -> jnp.ndarray:
    """Pairwise outer products → (B, P, D, D). PNN 'outer' mode
    (2.FM/CustomLayers.py:627-682 / OpnLayer :786-792)."""
    iu, ju = pair_indices(emb.shape[1])
    return jnp.einsum("bpd,bpe->bpde", emb[:, iu, :], emb[:, ju, :])


def field_aware_products(fa_emb: jnp.ndarray) -> jnp.ndarray:
    """FFM cross from a field-aware (B, F, F, D) embedding:
    Σ_{i<j} <v_{i,j}, v_{j,i}> — v_{i,j} = embedding of field i *toward*
    field j. Reference vectorized form: ``embeddings * transpose`` +
    upper-triangle mask (2.FM/CustomLayers.py:428-462). Returns (B, P, D)
    per-pair products (sum for the FFM logit)."""
    iu, ju = pair_indices(fa_emb.shape[1])
    return fa_emb[:, iu, ju, :] * fa_emb[:, ju, iu, :]


# ---------------------------------------------------------------------------
# parameterized interaction modules
class FwFMInteraction(nn.Module):
    """Field-weighted FM: learned scalar weight per field pair on top of the
    pairwise inner products (reference FwFMLayer, 2.FM/CustomLayers.py:500-533).
    """

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        ip = inner_products(emb)  # (B, P)
        w = self.param(
            "pair_weight", nn.initializers.ones_init(), (ip.shape[1],), jnp.float32
        ).astype(ip.dtype)
        return jnp.sum(ip * w, axis=-1)


class SENet(nn.Module):
    """Squeeze-and-Excitation over fields: mean-squeeze → 2-layer bottleneck →
    per-field reweighting (reference SENetLayer, 3.DCN/CustomLayers.py:954-974).
    Returns reweighted (B, F, D)."""

    reduction: int = 3
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        num_fields = emb.shape[1]
        z = jnp.mean(emb, axis=-1)  # (B, F)
        a = nn.Dense(max(1, num_fields // self.reduction), dtype=self.dtype, name="squeeze")(z)
        a = nn.relu(a)
        a = nn.Dense(num_fields, dtype=self.dtype, name="excite")(a)
        a = nn.relu(a)
        return emb * a[..., None]


class BilinearInteraction(nn.Module):
    """Bilinear field pair products p_{ij} = (v_i W) ∘ v_j with weight
    sharing mode 'all' | 'each' | 'interaction'
    (reference BilinearInteractionLayer, 3.DCN/CustomLayers.py:977-1009).
    Returns (B, P, D)."""

    mode: str = "all"
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        b, f, d = emb.shape
        iu, ju = pair_indices(f)
        p = len(iu)
        if self.mode == "all":
            w = self.param("w", nn.initializers.glorot_uniform(), (d, d), jnp.float32)
            left = jnp.einsum("bfd,de->bfe", emb, w.astype(emb.dtype))
            return left[:, iu, :] * emb[:, ju, :]
        if self.mode == "each":
            w = self.param("w", nn.initializers.glorot_uniform(), (f, d, d), jnp.float32)
            left = jnp.einsum("bfd,fde->bfe", emb, w.astype(emb.dtype))
            return left[:, iu, :] * emb[:, ju, :]
        if self.mode == "interaction":
            w = self.param("w", nn.initializers.glorot_uniform(), (p, d, d), jnp.float32)
            left = jnp.einsum("bpd,pde->bpe", emb[:, iu, :], w.astype(emb.dtype))
            return left * emb[:, ju, :]
        raise ValueError(f"unknown bilinear mode {self.mode!r}")


class SENetBilinear(nn.Module):
    """SENet reweighting followed by bilinear 'all'-mode pair products as ONE
    op (the FiBiNet hot path: SENetLayer 3.DCN/CustomLayers.py:954-974 →
    BilinearInteractionLayer :977-1009). On TPU the two stages run fused in a
    single Pallas kernel (tpurec.ops.pallas.kernels.senet_bilinear_fused) —
    the reweighted tensor and its bilinear map never round-trip HBM. Owns the
    same parameters as SENet + BilinearInteraction('all'). Returns (B, P, D)."""

    reduction: int = 3
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        b, f, d = emb.shape
        r = max(1, f // self.reduction)
        w1 = self.param("squeeze_kernel", nn.initializers.glorot_uniform(), (f, r), jnp.float32)
        b1 = self.param("squeeze_bias", nn.initializers.zeros_init(), (r,), jnp.float32)
        w2 = self.param("excite_kernel", nn.initializers.glorot_uniform(), (r, f), jnp.float32)
        b2 = self.param("excite_bias", nn.initializers.zeros_init(), (f,), jnp.float32)
        wb = self.param("w", nn.initializers.glorot_uniform(), (d, d), jnp.float32)
        from tpurec.ops.pallas.kernels import (
            pallas_available,
            senet_bilinear_fused,
            senet_bilinear_reference,
        )

        from tpurec.ops.pallas.kernels import fused_wins

        # phase-aware: fused fwd wins 2.6x but its fwd+bwd (XLA VJP of the
        # reference recompute) measures 0.45x — reference math during training
        fn = (
            senet_bilinear_fused
            if pallas_available() and fused_wins("senet")
            else senet_bilinear_reference
        )
        out = fn(emb.astype(jnp.float32), w1, w2, wb, b1, b2)
        return out.astype(emb.dtype)


class CrossNetwork(nn.Module):
    """DCN vector cross: x_{l+1} = x0 · (x_lᵀ w_l) + b_l + x_l
    (reference CrossLayer recurrence, 3.DCN/CustomLayers.py:195-203)."""

    num_layers: int = 3
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        d = x0.shape[-1]
        ws, bs = [], []
        for i in range(self.num_layers):
            ws.append(
                self.param(f"w_{i}", nn.initializers.glorot_uniform(), (d, 1), jnp.float32)
            )
            bs.append(self.param(f"b_{i}", nn.initializers.zeros_init(), (d,), jnp.float32))
        from tpurec.ops.pallas.kernels import (
            cross_network_stack,
            fused_wins,
            pallas_available,
        )

        # phase-aware: cross_train measures 0.95x (kernel_bench) — reference
        # math during training, the fused one-HBM-round-trip stack (2.7x) at
        # inference; backward (when traced) is the XLA VJP of the reference.
        if pallas_available() and fused_wins("cross"):
            w_stack = jnp.concatenate([w.T for w in ws], axis=0)  # (L, D)
            b_stack = jnp.stack(bs, axis=0)  # (L, D)
            return cross_network_stack(
                x0.astype(jnp.float32), w_stack, b_stack
            ).astype(x0.dtype)
        x = x0
        for i, (w, b) in enumerate(zip(ws, bs)):
            xw = jnp.einsum("bd,dk->bk", x, w.astype(x.dtype))  # (B, 1)
            x = x0 * xw + b.astype(x.dtype) + x
        return x


class CrossNetworkMatrix(nn.Module):
    """DCN-v2 matrix cross: x_{l+1} = x0 ∘ (W_l x_l + b_l) + x_l
    (reference MatrixCrossLayer, 3.DCN/CustomLayers.py:272-305)."""

    num_layers: int = 3
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        d = x0.shape[-1]
        x = x0
        for i in range(self.num_layers):
            wx = nn.Dense(d, dtype=self.dtype, name=f"dense_{i}")(x)
            x = x0 * wx + x
        return x


class CIN(nn.Module):
    """Compressed Interaction Network (xDeepFM): level k feature maps are
    1x1-conv compressions of the outer products between level k−1 maps and the
    raw fields (reference CINLayer split/matmul/conv1d at
    3.DCN/CustomLayers.py:377-417; einsum variant NewCINLayer :420-448).

    All levels run in one fused Pallas kernel on TPU (the per-level
    (B, H·F, D) outer-product tensor stays in VMEM; the unfused path
    round-trips it through HBM every level); pure-JAX einsum reference
    elsewhere and for the backward pass.
    """

    layer_sizes: Tuple[int, ...] = (128, 128)
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        from tpurec.ops.pallas.kernels import cin_fused, cin_reference, pallas_available

        b, f, d = emb.shape
        h = f
        weights = []
        for i, size in enumerate(self.layer_sizes):
            w = self.param(
                f"compress_{i}", nn.initializers.glorot_uniform(), (h * f, size), jnp.float32
            )
            weights.append(w)
            h = size
        # fused kernel needs lane-aligned level sizes (the (F, S) split keeps
        # S as the lane dim; Mosaic rejects non-128-multiple lane reshapes)
        from tpurec.ops.pallas.kernels import fused_wins

        # phase-aware: cin_train measures 0.88x (kernel_bench) — dispatch the
        # reference during training, the 2.3x fused kernel at inference
        fused_ok = (
            pallas_available()
            and fused_wins("cin")
            and all(s % 128 == 0 for s in self.layer_sizes)
        )
        fn = cin_fused if fused_ok else cin_reference
        return fn(emb.astype(jnp.float32), tuple(weights)).astype(
            self.dtype or emb.dtype
        )


class AFMInteraction(nn.Module):
    """Attentional FM: attention-pooled pairwise products
    (reference AttentionLayer + AFM, 3.DCN/CustomLayers.py:841-885).
    Returns the (B, D) attention-weighted interaction vector."""

    attention_dim: int = 16
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        products = pairwise_products(emb)  # (B, P, D)
        a = nn.Dense(self.attention_dim, dtype=self.dtype, name="proj")(products)
        a = nn.relu(a)
        a = nn.Dense(1, use_bias=False, dtype=self.dtype, name="score")(a)  # (B, P, 1)
        a = nn.softmax(a, axis=1)
        return jnp.sum(a * products, axis=1)


class InnerProductTower(nn.Module):
    """PNN product layer: [flat embeddings ∥ pairwise inner products] → MLP
    signal part (reference IpnLayer + PNNLayer, 2.FM/CustomLayers.py:685-792)."""

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        b = emb.shape[0]
        return jnp.concatenate([emb.reshape(b, -1), inner_products(emb)], axis=-1)


class OuterProductTower(nn.Module):
    """PNN outer mode with a learned kernel per pair-dim: compress the (D, D)
    outer products through a kernel instead of materializing (B,P,D,D) to the
    MLP (kernel types of 2.FM/CustomLayers.py:627-682, vectorized)."""

    kernel_type: str = "mat"  # 'mat' | 'vec' | 'num'
    dtype: Optional[type] = None

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        b, f, d = emb.shape
        iu, ju = pair_indices(f)
        p = len(iu)
        left, right = emb[:, iu, :], emb[:, ju, :]  # (B, P, D)
        if self.kernel_type == "mat":
            k = self.param("kernel", nn.initializers.glorot_uniform(), (p, d, d), jnp.float32)
            out = jnp.einsum("bpd,pde,bpe->bp", left, k.astype(emb.dtype), right)
        elif self.kernel_type == "vec":
            k = self.param("kernel", nn.initializers.glorot_uniform(), (p, d), jnp.float32)
            out = jnp.einsum("bpd,pd,bpd->bp", left, k.astype(emb.dtype), right)
        elif self.kernel_type == "num":
            k = self.param("kernel", nn.initializers.ones_init(), (p,), jnp.float32)
            out = jnp.einsum("bpd,bpd->bp", left, right) * k.astype(emb.dtype)
        else:
            raise ValueError(f"unknown kernel_type {self.kernel_type!r}")
        return jnp.concatenate([emb.reshape(b, -1), out], axis=-1)
