"""Pallas TPU kernels for the hot interaction ops.

Kernel surface (SURVEY §2.10): fused FM second-order, the DCN cross stack,
and the DIN activation-unit attention — the ops on the reference's hot paths
(FM cross 2.FM/CustomLayers.py:151-153; CrossLayer recurrence
3.DCN/CustomLayers.py:195-203; DIN per-step activation MLP under
tf.vectorized_map, 5.DIN/CustomLayers.py:163-180,270).

Design:
- forward = Pallas kernel (VMEM-resident tiles, MXU matmuls with fp32
  accumulation, fused elementwise); backward = XLA VJP of the pure-JAX
  reference implementation via jax.custom_vjp — numerically identical
  (same math), so training works while the forward path gets the fused
  kernel.
- every kernel has a pure-JAX reference (`*_reference`) used for the
  backward pass, for non-TPU platforms, and for parity tests; interpret
  mode exercises the kernels on CPU in CI.
- batch tiles are padded to the sublane multiple; all shapes static.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas imports fail on some non-TPU builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False


def pallas_available() -> bool:
    return _PALLAS_IMPORTED and jax.default_backend() == "tpu"


# --- phase-aware dispatch ---------------------------------------------------
# TRACE-TIME process flag (the set_sparse_mode pattern): the trainer sets it
# True while tracing the jitted train step, False elsewhere. Kernels whose
# fwd+bwd row in benchmarks/kernel_bench_results.json loses to XLA's VJP of
# the reference math dispatch the reference during training and the fused
# forward at inference — a model must never train SLOWER because of our own
# kernel (VERDICT r3 #5).
_TRAINING_PHASE = False

# measured on v5e, FULL train steps (engine_ab_results.json): no kernel
# wins fwd+bwd on the current toolchain. din's r3-era full-step win
# (13.79 -> 9.61 ms) no longer reproduces (10.23 WITH vs 10.12 without —
# din_dense_dinkernel rows); fm measured 43.5 with vs 42.6 without
# (kernel_bench's isolated *_train speedups are dispatch-dominated), and
# cross ~0.95x / capsule 0.87x / cin 0.88x / senet 0.45x lose to the XLA
# VJP of the reference recompute. Training therefore always runs reference
# math; the fused forwards dispatch at inference, where their 2.3-6.6x
# wins survive.
TRAIN_WINNERS = frozenset()


def set_training_phase(flag: bool) -> None:
    global _TRAINING_PHASE
    _TRAINING_PHASE = bool(flag)


def fused_wins(kernel: str) -> bool:
    """True when the fused kernel should dispatch in the CURRENT phase."""
    return (not _TRAINING_PHASE) or kernel in TRAIN_WINNERS


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ===========================================================================
# fused FM second-order
def fm_second_order_reference(emb: jnp.ndarray) -> jnp.ndarray:
    sum_sq = jnp.square(jnp.sum(emb, axis=1))
    sq_sum = jnp.sum(jnp.square(emb), axis=1)
    return 0.5 * jnp.sum(sum_sq - sq_sum, axis=-1)


def _fm_kernel(emb_ref, out_ref):
    emb = emb_ref[:].astype(jnp.float32)  # (Bt, F, D)
    total = jnp.sum(emb, axis=1)  # (Bt, D)
    cross = jnp.square(total) - jnp.sum(jnp.square(emb), axis=1)
    out_ref[:] = 0.5 * jnp.sum(cross, axis=-1, keepdims=True)  # (Bt, 1)


def _fm_pallas_call(emb: jnp.ndarray, block_b: int, interpret: bool) -> jnp.ndarray:
    b, f, d = emb.shape
    grid = (b // block_b,)
    out = pl.pallas_call(
        _fm_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(emb)
    return out[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fm_second_order_fused(
    emb: jnp.ndarray, block_b: int = 256, interpret: bool = False
) -> jnp.ndarray:
    """(B, F, D) → (B,) fused FM cross term. Pads B to the block multiple."""
    b = emb.shape[0]
    bb = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, bb)
    if b_pad != b:
        emb = jnp.pad(emb, ((0, b_pad - b), (0, 0), (0, 0)))
    return _fm_pallas_call(emb, bb, interpret)[:b]


def _fm_fwd(emb, block_b, interpret):
    return fm_second_order_fused(emb, block_b, interpret), emb


def _fm_bwd(block_b, interpret, emb, g):
    _, vjp = jax.vjp(fm_second_order_reference, emb)
    return vjp(g)


fm_second_order_fused.defvjp(_fm_fwd, _fm_bwd)


# ===========================================================================
# DCN vector-cross stack: all layers fused in one kernel
def cross_network_reference(
    x0: jnp.ndarray, weights: jnp.ndarray, biases: jnp.ndarray
) -> jnp.ndarray:
    """x_{l+1} = x0·(x_l @ w_l) + b_l + x_l; weights (L, D), biases (L, D)."""
    x = x0
    for l in range(weights.shape[0]):
        xw = jnp.einsum("bd,d->b", x, weights[l])
        x = x0 * xw[:, None] + biases[l][None, :] + x
    return x


def _cross_kernel(x0_ref, w_ref, b_ref, out_ref):
    x0 = x0_ref[:].astype(jnp.float32)  # (Bt, D)
    w = w_ref[:].astype(jnp.float32)  # (L, D)
    bias = b_ref[:].astype(jnp.float32)  # (L, D)
    num_layers = w.shape[0]
    x = x0
    for l in range(num_layers):  # static unroll — L is small (2-4)
        xw = jnp.sum(x * w[l][None, :], axis=-1, keepdims=True)  # (Bt, 1)
        x = x0 * xw + bias[l][None, :] + x
    out_ref[:] = x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def cross_network_stack(
    x0: jnp.ndarray,
    weights: jnp.ndarray,
    biases: jnp.ndarray,
    block_b: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused multi-layer DCN vector cross. One HBM read of x0, one write of
    the final x — the reference (and naive XLA) round-trips every layer."""
    b, d = x0.shape
    bb = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, bb)
    x_in = jnp.pad(x0, ((0, b_pad - b), (0, 0))) if b_pad != b else x0
    out = pl.pallas_call(
        _cross_kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(weights.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(biases.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_in, weights, biases)
    return out[:b].astype(x0.dtype)


def _cross_fwd(x0, weights, biases, block_b, interpret):
    return cross_network_stack(x0, weights, biases, block_b, interpret), (x0, weights, biases)


def _cross_bwd(block_b, interpret, res, g):
    x0, weights, biases = res
    _, vjp = jax.vjp(cross_network_reference, x0, weights, biases)
    return vjp(g.astype(jnp.float32))


cross_network_stack.defvjp(_cross_fwd, _cross_bwd)


# ===========================================================================
# CIN (xDeepFM compressed interaction) — all levels fused in one kernel
def cin_reference(emb: jnp.ndarray, weights: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """Pure-JAX CIN: per level z = outer(x, emb) over fields, compressed by
    w_l (H_l*F, S_l); returns concatenated sum-pooled maps (B, Σ S_l).
    Reference math: CINLayer 3.DCN/CustomLayers.py:377-417."""
    b, f, d = emb.shape
    x = emb
    outs = []
    for w in weights:
        h = x.shape[1]
        z = jnp.einsum("bhd,bfd->bhfd", x, emb).reshape(b, h * f, d)
        x = jnp.einsum("bpd,ps->bsd", z, w)
        outs.append(jnp.sum(x, axis=-1))
    return jnp.concatenate(outs, axis=-1)


def _cin_kernel(emb_ref, *refs):
    out_ref = refs[-1]
    w_refs = refs[:-1]
    e = emb_ref[:].astype(jnp.float32)  # (Bt, D, F) — field-last layout
    bt, d, f = e.shape
    x = e
    offset = 0
    for w_ref in w_refs:  # static unroll — level count is small (2-3)
        # w prepacked as (H, F*S): w2[h, f*S+s] = W[h*F+f, s]. Contract H
        # first (one MXU matmul), then split (F, S) — the last dim stays S
        # (lane-aligned; Mosaic rejects collapsing (H, F) sublane dims) —
        # and reduce over F against the raw fields:
        #   next[b,d,s] = Σ_f e[b,d,f] · (Σ_h x[b,d,h] W[h,f,s])
        w = w_ref[:].astype(jnp.float32)
        s = w.shape[1] // f
        t = jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).reshape(bt, d, f, s)
        # Σ_f unrolled on 3-D tiles via range slices (Mosaic mis-lays-out the
        # 4-D reduction, and integer indexing lowers to an unsupported gather)
        x = None
        for i in range(f):
            ti = t[:, :, i : i + 1, :].reshape(bt, d, s)
            ei = e[:, :, i : i + 1]  # (Bt, D, 1)
            x = ei * ti if x is None else x + ei * ti  # (Bt, D, S)
        out_ref[:, offset : offset + s] = jnp.sum(x, axis=1)
        offset += s


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cin_fused(
    emb: jnp.ndarray,
    weights: Tuple[jnp.ndarray, ...],
    block_b: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused multi-level CIN. The (B, H·F, D) outer-product tensor of every
    level lives only in VMEM per batch tile — the unfused XLA path round-trips
    it through HBM once per level (≈ B·H·F·D·4 bytes each way)."""
    b, f, d = emb.shape
    total_s = int(sum(int(w.shape[1]) for w in weights))
    bb = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, bb)
    emb_t = jnp.swapaxes(emb, 1, 2)  # (B, D, F)
    if b_pad != b:
        emb_t = jnp.pad(emb_t, ((0, b_pad - b), (0, 0), (0, 0)))
    # prepack each (H*F, S) weight as (H, F*S) for the H-first contraction
    packed = [w.reshape(w.shape[0] // f, f * w.shape[1]) for w in weights]
    out = pl.pallas_call(
        _cin_kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, total_s), jnp.float32),
        grid=(b_pad // bb,),
        in_specs=[pl.BlockSpec((bb, d, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in packed
        ],
        out_specs=pl.BlockSpec((bb, total_s), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(emb_t, *packed)
    return out[:b].astype(emb.dtype)


def _cin_fwd(emb, weights, block_b, interpret):
    return cin_fused(emb, weights, block_b, interpret), (emb, weights)


def _cin_bwd(block_b, interpret, res, g):
    emb, weights = res
    _, vjp = jax.vjp(cin_reference, emb.astype(jnp.float32), tuple(weights))
    return vjp(g.astype(jnp.float32))


cin_fused.defvjp(_cin_fwd, _cin_bwd)


# ===========================================================================
# DIN activation-unit attention, fully fused
def din_attention_reference(
    query: jnp.ndarray,  # (B, D)
    keys: jnp.ndarray,  # (B, L, D)
    mask: jnp.ndarray,  # (B, L)
    w1: jnp.ndarray,  # (4D, H)
    b1: jnp.ndarray,  # (H,)
    w2: jnp.ndarray,  # (H,)
    alpha: Optional[jnp.ndarray] = None,  # (H,) PReLU slopes; None = relu
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, l, d = keys.shape
    q = jnp.broadcast_to(query[:, None, :], (b, l, d))
    feats = jnp.concatenate([q, q - keys, keys, q * keys], axis=-1)
    lin = feats @ w1 + b1
    hidden = jnp.maximum(lin, 0.0)
    if alpha is not None:
        hidden = hidden + alpha * jnp.minimum(lin, 0.0)
    scores = hidden @ w2
    scores = jnp.where(mask.astype(bool), scores, 0.0)
    pooled = jnp.einsum("bl,bld->bd", scores, keys)
    return pooled, scores


def _din_kernel(q_ref, k_ref, m_ref, w1_ref, b1_ref, w2_ref, alpha_ref, pooled_ref, scores_ref):
    q = q_ref[:].astype(jnp.float32)  # (Bt, D)
    keys = k_ref[:].astype(jnp.float32)  # (Bt, L, D)
    mask = m_ref[:].astype(jnp.float32)  # (Bt, L)
    w1 = w1_ref[:].astype(jnp.float32)  # (4D, H)
    b1 = b1_ref[:].astype(jnp.float32)  # (1, H)
    w2 = w2_ref[:].astype(jnp.float32)  # (H, 1)
    bt, l, d = keys.shape
    # Matmuls run at default MXU precision (bf16 inputs, fp32 accumulate) —
    # the same precision class XLA picks for the unfused path; measured 1.7x
    # faster than Precision.HIGHEST with no training-quality impact. The
    # interpret-mode parity tests pin the exact math.
    # decompose w1 into the four feature blocks: feats = [q, q-k, k, q*k]
    w_q = w1[0:d] + w1[d : 2 * d]  # q and (q−k)'s q part
    w_k = w1[2 * d : 3 * d] - w1[d : 2 * d]  # k and −(q−k)'s k part
    w_p = w1[3 * d : 4 * d]  # q*k block
    hq = jnp.dot(q, w_q, preferred_element_type=jnp.float32)  # (Bt, H)
    k2 = keys.reshape(bt * l, d)
    hk = jnp.dot(k2, w_k, preferred_element_type=jnp.float32)
    qk = (q[:, None, :] * keys).reshape(bt * l, d)
    hp = jnp.dot(qk, w_p, preferred_element_type=jnp.float32)
    hq_rep = jnp.broadcast_to(hq[:, None, :], (bt, l, hq.shape[-1])).reshape(bt * l, -1)
    lin = hk + hp + hq_rep + b1
    alpha = alpha_ref[:].astype(jnp.float32)  # (1, H)
    h = jnp.maximum(lin, 0.0) + alpha * jnp.minimum(lin, 0.0)
    s = jnp.dot(h, w2, preferred_element_type=jnp.float32).reshape(bt, l)
    s = s * mask
    scores_ref[:] = s
    pooled_ref[:] = jnp.sum(s[:, :, None] * keys, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def din_attention_fused(
    query, keys, mask, w1, b1, w2, alpha=None, block_b: int = 64, interpret: bool = False
):
    """Fused DIN target attention: never materializes the (B, L, 4D) feature
    tensor in HBM (the reference materializes it per step under
    tf.vectorized_map). Returns (pooled (B, D), scores (B, L))."""
    b, l, d = keys.shape
    h = w1.shape[1]
    if alpha is None:
        alpha = jnp.zeros((h,), jnp.float32)
    bb = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, bb)
    if b_pad != b:
        query = jnp.pad(query, ((0, b_pad - b), (0, 0)))
        keys = jnp.pad(keys, ((0, b_pad - b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)))
    pooled, scores = pl.pallas_call(
        _din_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, l), jnp.float32),
        ),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(query, keys, mask, w1, b1.reshape(1, -1), w2.reshape(-1, 1), alpha.reshape(1, -1))
    return pooled[:b], scores[:b]


def _din_bwd_kernel(
    q_ref, k_ref, m_ref, w1_ref, b1_ref, w2_ref, w2r_ref, alpha_ref, gp_ref, gs_ref,
    dq_ref, dk_ref, dw1_ref, db1_ref, dw2_ref, dalpha_ref,
):
    """Fused DIN attention backward: recompute-in-VMEM of the activation-unit
    MLP (no (B, L, H) residual ever touches HBM), all grads in one pass.
    BENCH r2 measured the unfused XLA VJP at 75% of the DIN train step —
    this kernel is that fix (VERDICT r2 next-step #3)."""
    f32 = jnp.float32
    q = q_ref[:].astype(f32)  # (Bt, D)
    keys = k_ref[:].astype(f32)  # (Bt, L, D)
    mask = m_ref[:].astype(f32)  # (Bt, L)
    w1 = w1_ref[:].astype(f32)  # (4D, H)
    b1 = b1_ref[:].astype(f32)  # (1, H)
    w2 = w2_ref[:].astype(f32)  # (H, 1)
    w2r = w2r_ref[:].astype(f32)  # (1, H) — same values; Mosaic rejects the
    # (H, 1) -> (1, H) shape cast in-kernel, so the wrapper passes both
    alpha = alpha_ref[:].astype(f32)  # (1, H)
    gp = gp_ref[:].astype(f32)  # (Bt, D)
    gs = gs_ref[:].astype(f32)  # (Bt, L)
    bt, l, d = keys.shape
    # ---- recompute forward intermediates (same decomposition as _din_kernel)
    w_q = w1[0:d] + w1[d : 2 * d]
    w_k = w1[2 * d : 3 * d] - w1[d : 2 * d]
    w_p = w1[3 * d : 4 * d]
    k2 = keys.reshape(bt * l, d)
    qk = (q[:, None, :] * keys).reshape(bt * l, d)
    hq = jnp.dot(q, w_q, preferred_element_type=f32)  # (Bt, H)
    lin = (
        jnp.dot(k2, w_k, preferred_element_type=f32)
        + jnp.dot(qk, w_p, preferred_element_type=f32)
        + jnp.broadcast_to(hq[:, None, :], (bt, l, hq.shape[-1])).reshape(bt * l, -1)
        + b1
    )  # (BtL, H)
    neg_part = jnp.minimum(lin, 0.0)
    hval = jnp.maximum(lin, 0.0) + alpha * neg_part
    s = jnp.dot(hval, w2, preferred_element_type=f32).reshape(bt, l) * mask
    # ---- backward
    # ds from pooling: pooled = sum_l s * keys
    gs_tot = (gs + jnp.sum(gp[:, None, :] * keys, axis=-1)) * mask  # (Bt, L)
    # keep lane dims intact: (Bt, L) -> (Bt, L, 1) broadcasts, leading-dim
    # collapses only (Mosaic rejects (Bt, L) -> (Bt*L, 1) shape casts)
    dh = (gs_tot[:, :, None] * w2r[None]).reshape(bt * l, -1)  # (BtL, H)
    dlin = dh * (jnp.where(lin > 0, 1.0, 0.0) + alpha * jnp.where(lin < 0, 1.0, 0.0))
    # parameter-grad contributions of this batch tile
    dw2_c = jnp.sum(
        (gs_tot[:, :, None] * hval.reshape(bt, l, -1)).reshape(bt * l, -1),
        axis=0, keepdims=True,
    )  # (1, H)
    dalpha_c = jnp.sum(dh * neg_part, axis=0, keepdims=True)  # (1, H)
    db1_c = jnp.sum(dlin, axis=0, keepdims=True)  # (1, H)
    dlin_b = jnp.sum(dlin.reshape(bt, l, -1), axis=1)  # (Bt, H)
    a_c = jax.lax.dot_general(
        q, dlin_b, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # (D, H) — sum_b q^T (sum_l dlin)
    k_c = jax.lax.dot_general(
        k2, dlin, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # (D, H)
    p_c = jax.lax.dot_general(
        qk, dlin, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # (D, H)
    # input grads
    dqp = jnp.dot(dlin, w_p.T, preferred_element_type=f32).reshape(bt, l, d)
    dq_ref[:] = jnp.dot(dlin_b, w_q.T, preferred_element_type=f32) + jnp.sum(
        dqp * keys, axis=1
    )
    dk_ref[:] = (
        jnp.dot(dlin, w_k.T, preferred_element_type=f32).reshape(bt, l, d)
        + dqp * q[:, None, :]
        + s[:, :, None] * gp[:, None, :]
    )
    # accumulate param grads across the sequential batch-tile grid
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[0:d] = a_c
        dw1_ref[d : 2 * d] = a_c - k_c
        dw1_ref[2 * d : 3 * d] = k_c
        dw1_ref[3 * d : 4 * d] = p_c
        db1_ref[:] = db1_c
        dw2_ref[:] = dw2_c
        dalpha_ref[:] = dalpha_c

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dw1_ref[0:d] += a_c
        dw1_ref[d : 2 * d] += a_c - k_c
        dw1_ref[2 * d : 3 * d] += k_c
        dw1_ref[3 * d : 4 * d] += p_c
        db1_ref[:] += db1_c
        dw2_ref[:] += dw2_c
        dalpha_ref[:] += dalpha_c


def din_attention_bwd_fused(
    query, keys, mask, w1, b1, w2, alpha, gp, gs,
    block_b: int = 32, interpret: bool = False,
):
    """Pallas DIN-attention backward. Returns (dq, dkeys, dw1, db1, dw2,
    dalpha) in fp32; mask gets no gradient.

    block_b caps at 32: the (Bt·L, H) recompute intermediates pad H to the
    128-lane tile, so at bb=64/L=64 the kernel's scoped VMEM is ~20 MB —
    past the 16 MB Mosaic stack limit (measured compile failure on v5e);
    bb=32 keeps it ~10 MB."""
    b, l, d = keys.shape
    h = w1.shape[1]
    bb = min(block_b, 32, _round_up(b, 8))
    b_pad = _round_up(b, bb)
    if b_pad != b:
        query = jnp.pad(query, ((0, b_pad - b), (0, 0)))
        keys = jnp.pad(keys, ((0, b_pad - b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)))
        gp = jnp.pad(gp, ((0, b_pad - b), (0, 0)))
        gs = jnp.pad(gs, ((0, b_pad - b), (0, 0)))
    zero2 = lambda i: (0, 0)  # noqa: E731
    dq, dk, dw1, db1, dw2, dalpha = pl.pallas_call(
        _din_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, l, d), jnp.float32),
            jax.ShapeDtypeStruct((4 * d, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * d, h), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * d, h), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), zero2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), zero2, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        query, keys, mask, w1, b1.reshape(1, -1), w2.reshape(-1, 1),
        w2.reshape(1, -1), alpha.reshape(1, -1), gp, gs,
    )
    return dq[:b], dk[:b], dw1, db1.reshape(-1), dw2.reshape(-1), dalpha.reshape(-1)


def _din_fwd(query, keys, mask, w1, b1, w2, alpha, block_b, interpret):
    out = din_attention_fused(query, keys, mask, w1, b1, w2, alpha, block_b, interpret)
    return out, (query, keys, mask, w1, b1, w2, alpha)


def _din_bwd(block_b, interpret, res, g):
    query, keys, mask, w1, b1, w2, alpha = res
    had_alpha = alpha is not None
    if alpha is None:
        alpha = jnp.zeros((w1.shape[1],), jnp.float32)
    gp, gs = (x.astype(jnp.float32) for x in g)
    dq, dk, dw1, db1, dw2, dalpha = din_attention_bwd_fused(
        query.astype(jnp.float32),
        keys.astype(jnp.float32),
        mask.astype(jnp.float32),
        w1.astype(jnp.float32),
        b1.astype(jnp.float32),
        w2.astype(jnp.float32),
        alpha.astype(jnp.float32),
        gp,
        gs,
        block_b=min(block_b, 32),
        interpret=interpret,
    )
    if jnp.issubdtype(mask.dtype, jnp.floating):
        dmask = jnp.zeros_like(mask)  # mask enters via a bool cast — no grad
    else:
        dmask = np.zeros(mask.shape, jax.dtypes.float0)
    return dq, dk, dmask, dw1, db1, dw2, (dalpha if had_alpha else None)


din_attention_fused.defvjp(_din_fwd, _din_bwd)


# ===========================================================================
# SENet excitation + bilinear 'all' pair products, fused (FiBiNet hot path)
def senet_bilinear_reference(
    emb: jnp.ndarray,  # (B, F, D)
    w1: jnp.ndarray,  # (F, R) squeeze
    w2: jnp.ndarray,  # (R, F) excite
    wb: jnp.ndarray,  # (D, D) shared bilinear map ('all' mode)
    b1: Optional[jnp.ndarray] = None,  # (R,)
    b2: Optional[jnp.ndarray] = None,  # (F,)
) -> jnp.ndarray:
    """SENet reweighting (mean-squeeze → relu bottleneck → relu excite,
    reference SENetLayer 3.DCN/CustomLayers.py:954-974) followed by bilinear
    field-pair products p_ij = (v_i W) ∘ v_j in 'all' weight-sharing mode
    (BilinearInteractionLayer :977-1009). Returns (B, P, D), P = F(F−1)/2,
    pairs in np.triu_indices order."""
    z = jnp.mean(emb, axis=-1)  # (B, F)
    a = z @ w1
    if b1 is not None:
        a = a + b1
    a = jnp.maximum(a, 0.0) @ w2
    if b2 is not None:
        a = a + b2
    a = jnp.maximum(a, 0.0)
    v = emb * a[..., None]
    left = jnp.einsum("bfd,de->bfe", v, wb)
    iu, ju = np.triu_indices(emb.shape[1], k=1)
    return left[:, iu, :] * v[:, ju, :]


def _senet_bilinear_kernel(emb_ref, w1_ref, b1_ref, w2_ref, b2_ref, wb_ref, out_ref):
    # field-LAST layout (Bt, D, F) throughout — same trick as the CIN kernel:
    # keeping D in sublanes and F/P in lanes avoids the 4× lane padding a
    # (Bt, P, 32) tile would pay (D=32 < the 128-lane tile)
    e = emb_ref[:].astype(jnp.float32)  # (Bt, D, F)
    bt, d, f = e.shape
    z = jnp.mean(e, axis=1)  # (Bt, F)
    a = jnp.maximum(
        jnp.dot(z, w1_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
        + b1_ref[:].astype(jnp.float32),
        0.0,
    )
    a = jnp.maximum(
        jnp.dot(a, w2_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
        + b2_ref[:].astype(jnp.float32),
        0.0,
    )  # (Bt, F)
    v = e * a[:, None, :]
    # left[b,dd,f] = Σ_d' wb[d',dd]·v[b,d',f] — batched MXU contraction with
    # wb broadcast over the batch tile (Mosaic supports batched dot_general)
    wb_b = jnp.broadcast_to(wb_ref[:].astype(jnp.float32)[None], (bt, d, d))
    left = jax.lax.dot_general(
        wb_b, v, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (Bt, D, F)
    # upper-triangle pairs, unrolled over the anchor field i (static, F−1
    # slices) — row-major (i, j>i) order matches np.triu_indices
    offset = 0
    for i in range(f - 1):
        cnt = f - 1 - i
        out_ref[:, :, offset : offset + cnt] = left[:, :, i : i + 1] * v[:, :, i + 1 :]
        offset += cnt


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def senet_bilinear_fused(
    emb: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    wb: jnp.ndarray,
    b1: Optional[jnp.ndarray] = None,
    b2: Optional[jnp.ndarray] = None,
    block_b: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SENet → bilinear: the reweighted embedding tensor v and the
    mapped tensor (v·W) live only in VMEM per batch tile — the unfused path
    round-trips both (B·F·D each) plus the squeeze/excite activations
    through HBM between the five XLA ops."""
    b, f, d = emb.shape
    r = w1.shape[1]
    p = f * (f - 1) // 2
    if b1 is None:
        b1 = jnp.zeros((r,), jnp.float32)
    if b2 is None:
        b2 = jnp.zeros((f,), jnp.float32)
    bb = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, bb)
    e_in = jnp.swapaxes(emb, 1, 2)  # (B, D, F) — see kernel layout note
    if b_pad != b:
        e_in = jnp.pad(e_in, ((0, b_pad - b), (0, 0), (0, 0)))
    out = pl.pallas_call(
        _senet_bilinear_kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, d, p), jnp.float32),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, d, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, d, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(e_in, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1), wb)
    return jnp.swapaxes(out[:b], 1, 2).astype(emb.dtype)


def _senet_fwd(emb, w1, w2, wb, b1, b2, block_b, interpret):
    out = senet_bilinear_fused(emb, w1, w2, wb, b1, b2, block_b, interpret)
    return out, (emb, w1, w2, wb, b1, b2)


def _senet_bwd(block_b, interpret, res, g):
    emb, w1, w2, wb, b1, b2 = res
    had_b1, had_b2 = b1 is not None, b2 is not None
    if b1 is None:
        b1 = jnp.zeros((w1.shape[1],), jnp.float32)
    if b2 is None:
        b2 = jnp.zeros((w2.shape[1],), jnp.float32)
    _, vjp = jax.vjp(
        senet_bilinear_reference,
        emb.astype(jnp.float32),
        w1.astype(jnp.float32),
        w2.astype(jnp.float32),
        wb.astype(jnp.float32),
        b1.astype(jnp.float32),
        b2.astype(jnp.float32),
    )
    grads = list(vjp(g.astype(jnp.float32)))
    if not had_b1:
        grads[4] = None
    if not had_b2:
        grads[5] = None
    return tuple(grads)


senet_bilinear_fused.defvjp(_senet_fwd, _senet_bwd)


# ===========================================================================
# capsule dynamic routing ('shared' bilinear map — MIND), all iterations fused
def capsule_routing_reference(
    behavior: jnp.ndarray,  # (B, L, D)
    mask: jnp.ndarray,  # (B, L)
    s: jnp.ndarray,  # (D, E) shared bilinear map
    logits0: jnp.ndarray,  # (B, K, L) routing-logit init (non-trainable)
    num_iters: int = 3,
) -> jnp.ndarray:
    """Dynamic routing (reference MultiInterestExtractorLayer,
    6.MIND/CustomLayers.py:105-138): iterate masked softmax over capsules →
    weighted sum of u_hat = behavior·S → squash → logit update. Intermediate
    iterations run on stop-gradient(u_hat); the last uses the live value
    (so the VJP matches tpurec.ops.capsule.CapsuleRouting). Returns (B, K, E)."""
    from tpurec.ops.capsule import squash

    u_hat = jnp.einsum("bld,de->ble", behavior, s)
    u_sg = jax.lax.stop_gradient(u_hat)
    seq_mask = mask.astype(bool)[:, None, :]
    logits = logits0
    capsules = None
    for it in range(num_iters):
        masked = jnp.where(seq_mask, logits, -1e9)
        w = jax.nn.softmax(masked, axis=1) * mask[:, None, :]
        src = u_hat if it == num_iters - 1 else u_sg
        z = jnp.einsum("bkl,ble->bke", w, src)
        capsules = squash(z)
        if it < num_iters - 1:
            logits = logits + jnp.einsum("bke,ble->bkl", capsules, u_sg)
    return capsules


def _capsule_kernel(num_iters, beh_ref, m_ref, s_ref, l0_ref, out_ref):
    beh = beh_ref[:].astype(jnp.float32)  # (Bt, L, D)
    mask = m_ref[:].astype(jnp.float32)  # (Bt, L)
    bt, l, d = beh.shape
    u = jnp.dot(
        beh.reshape(bt * l, d), s_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(bt, l, -1)  # (Bt, L, E) — resident in VMEM for ALL iterations
    logits = l0_ref[:].astype(jnp.float32)  # (Bt, K, L)
    neg = -1e9 * (1.0 - mask)[:, None, :]
    caps = None
    for it in range(num_iters):  # static unroll — 3 iterations
        w = jax.nn.softmax(logits + neg, axis=1) * mask[:, None, :]
        # z[b,k,:] = Σ_l w[b,k,l]·u[b,l,:] — batched MXU matmul
        z = jax.lax.dot_general(
            w, u, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (Bt, K, E)
        sq = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
        caps = (sq / (1.0 + sq)) * z * jax.lax.rsqrt(sq + 1e-9)
        if it < num_iters - 1:
            # logits += caps·uᵀ — the agreement term, again one batched dot
            logits = logits + jax.lax.dot_general(
                caps, u, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (Bt, K, L)
    out_ref[:] = caps


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def capsule_routing_fused(
    behavior: jnp.ndarray,
    mask: jnp.ndarray,
    s: jnp.ndarray,
    logits0: jnp.ndarray,
    num_iters: int = 3,
    block_b: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused dynamic routing: u_hat (B·L·E) is computed once and stays in
    VMEM across all routing iterations — the unfused path re-reads it from
    HBM for the two einsums of every iteration (≈ 2·iters·B·L·E·4 bytes)."""
    b, l, d = behavior.shape
    k = logits0.shape[1]
    e = s.shape[1]
    bb = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, bb)
    if b_pad != b:
        behavior = jnp.pad(behavior, ((0, b_pad - b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)))
        logits0 = jnp.pad(logits0, ((0, b_pad - b), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_capsule_kernel, num_iters),
        out_shape=jax.ShapeDtypeStruct((b_pad, k, e), jnp.float32),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(s.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, k, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, k, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(behavior, mask, s, logits0)
    return out[:b].astype(behavior.dtype)


def _capsule_bwd_kernel(
    num_iters, beh_ref, m_ref, s_ref, l0_ref, g_ref, db_ref, dl0_ref, ds_ref
):
    """Fused routing backward: recompute the forward entirely in VMEM (u_hat
    plus the tiny per-iteration (K,L)/(K,E) stashes), then one reverse sweep
    through the routing recurrence. Gradient structure (matches
    capsule_routing_reference's stop-gradient placement): behavior/S get
    cotangents ONLY through the last iteration's live z = w·u_hat; logits0
    gets the full softmax-chain cotangent."""
    f32 = jnp.float32
    beh = beh_ref[:].astype(f32)  # (Bt, L, D)
    mask = m_ref[:].astype(f32)  # (Bt, L)
    s = s_ref[:].astype(f32)  # (D, E)
    g = g_ref[:].astype(f32)  # (Bt, K, E)
    bt, l, d = beh.shape
    u = jnp.dot(beh.reshape(bt * l, d), s, preferred_element_type=f32).reshape(
        bt, l, -1
    )  # (Bt, L, E)
    neg = -1e9 * (1.0 - mask)[:, None, :]
    # ---- forward recompute, stashing per-iteration p/w/z (all VMEM-tiny)
    logits = l0_ref[:].astype(f32)  # (Bt, K, L)
    ps, ws, zs = [], [], []
    for it in range(num_iters):  # static unroll
        p = jax.nn.softmax(logits + neg, axis=1)
        w = p * mask[:, None, :]
        z = jax.lax.dot_general(
            w, u, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )  # (Bt, K, E)
        ps.append(p)
        ws.append(w)
        zs.append(z)
        if it < num_iters - 1:
            sq = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
            caps = (sq / (1.0 + sq)) * z * jax.lax.rsqrt(sq + 1e-9)
            logits = logits + jax.lax.dot_general(
                caps, u, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
            )

    def squash_vjp(gc, z):
        # caps = a(sq)·z with a = sq/((1+sq)·sqrt(sq+eps));
        # dz = a·gc + 2z·a'(sq)·(gc·z), a' = rsqrt/(1+sq) − a/(1+sq) − a/(2(sq+eps))
        sq = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
        rs = jax.lax.rsqrt(sq + 1e-9)
        a = (sq / (1.0 + sq)) * rs
        ap = rs / (1.0 + sq) - a / (1.0 + sq) - a / (2.0 * (sq + 1e-9))
        gz = jnp.sum(gc * z, axis=-1, keepdims=True)
        return a * gc + 2.0 * z * ap * gz

    def softmax_vjp(dw, p):
        # w = softmax(logits+neg, axis=1)·mask; neg/mask are constants
        dp = dw * mask[:, None, :]
        return p * (dp - jnp.sum(p * dp, axis=1, keepdims=True))

    # ---- reverse sweep
    dz = squash_vjp(g, zs[-1])
    # z_last = w_last·u with LIVE u — the only path into behavior/S
    du = jax.lax.dot_general(
        ws[-1], dz, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32
    )  # (Bt, L, E) = Σ_k w[bkl]·dz[bke]
    dw = jax.lax.dot_general(
        dz, u, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (Bt, K, L)
    dlog = softmax_vjp(dw, ps[-1])
    for it in range(num_iters - 2, -1, -1):
        # logits_{it+1} = logits_it + caps_it·uᵀ (u stop-grad)
        dcaps = jax.lax.dot_general(
            dlog, u, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
        )  # (Bt, K, E)
        dz_i = squash_vjp(dcaps, zs[it])
        dw_i = jax.lax.dot_general(
            dz_i, u, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )
        dlog = dlog + softmax_vjp(dw_i, ps[it])
    dl0_ref[:] = dlog
    db_ref[:] = jnp.dot(
        du.reshape(bt * l, -1), s.T, preferred_element_type=f32
    ).reshape(bt, l, d)
    ds_c = jax.lax.dot_general(
        beh.reshape(bt * l, d), du.reshape(bt * l, -1),
        (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )  # (D, E)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ds_ref[:] = ds_c

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        ds_ref[:] += ds_c


def capsule_routing_bwd_fused(
    behavior, mask, s, logits0, g, num_iters: int = 3,
    block_b: int = 32, interpret: bool = False,
):
    """Pallas routing backward. Returns (dbehavior, ds, dlogits0) in fp32."""
    b, l, d = behavior.shape
    k = logits0.shape[1]
    e = s.shape[1]
    bb = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, bb)
    if b_pad != b:
        behavior = jnp.pad(behavior, ((0, b_pad - b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)))
        logits0 = jnp.pad(logits0, ((0, b_pad - b), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, b_pad - b), (0, 0), (0, 0)))
    db, dl0, ds = pl.pallas_call(
        functools.partial(_capsule_bwd_kernel, num_iters),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, l, d), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k, l), jnp.float32),
            jax.ShapeDtypeStruct((d, e), jnp.float32),
        ),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, k, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, k, e), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, k, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(behavior, mask, s, logits0, g)
    return db[:b], ds, dl0[:b]


def _capsule_fwd(behavior, mask, s, logits0, num_iters, block_b, interpret):
    out = capsule_routing_fused(behavior, mask, s, logits0, num_iters, block_b, interpret)
    return out, (behavior, mask, s, logits0)


def _capsule_bwd(num_iters, block_b, interpret, res, g):
    behavior, mask, s, logits0 = res
    db, ds, dl0 = capsule_routing_bwd_fused(
        behavior.astype(jnp.float32),
        mask.astype(jnp.float32),
        s.astype(jnp.float32),
        logits0.astype(jnp.float32),
        g.astype(jnp.float32),
        num_iters, block_b, interpret,
    )
    return db, None, ds, dl0


capsule_routing_fused.defvjp(_capsule_fwd, _capsule_bwd)
