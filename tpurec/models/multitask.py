"""Multi-task stack: MMOE, ESMM, PLE, ESM2, ESCM2 (IPS/DR), FDN.

Capability parity with chapters 4 and 9 of the reference
(4.MMOE/CustomLayers.py, 9.ESCM2/CustomLayers.py). Expert banks run as one
batched einsum per layer (experts share the (in, E, out) weight tensor) so the
MXU sees one large matmul instead of E small ones — the reference loops
Python-level expert MLPs.

Known reference bugs NOT replicated: the MMOE/ESMM double-softmax on gates
(4.MMOE/CustomLayers.py:227-233) — gates are softmaxed exactly once here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from jax.lax import stop_gradient as jax_stop_gradient
from flax import linen as nn
from jax.sharding import Mesh

from tpurec.embedding.modules import SharedEmbedding
from tpurec.models.base import Inputs, Outputs, stack_continuous, stack_ids
from tpurec.ops.mlp import MLP

_EPS = 1e-7


def _bce(labels: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
    p = jnp.clip(probs.astype(jnp.float32), _EPS, 1 - _EPS)
    y = labels.astype(jnp.float32)
    return -(y * jnp.log(p) + (1 - y) * jnp.log1p(-p))


class ExpertBank(nn.Module):
    """E parallel MLPs evaluated as batched einsums: weights (E, in, out)."""

    num_experts: int
    hidden_dims: Sequence[int]
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: (B, D) or (B, E, D) for per-expert streams
        if x.ndim == 2:
            x = jnp.broadcast_to(x[:, None, :], (x.shape[0], self.num_experts, x.shape[-1]))
        for i, width in enumerate(self.hidden_dims):
            w = self.param(
                f"w_{i}",
                nn.initializers.glorot_uniform(),
                (self.num_experts, x.shape[-1], width),
                jnp.float32,
            )
            b = self.param(
                f"b_{i}", nn.initializers.zeros_init(), (self.num_experts, width), jnp.float32
            )
            x = jnp.einsum("bed,edh->beh", x, w.astype(x.dtype)) + b.astype(x.dtype)
            x = nn.relu(x)
        return x  # (B, E, out)


class _MultiTaskBase(nn.Module):
    feature_names: Sequence[str]
    vocab_size: int
    continuous_names: Sequence[str] = ()
    embed_dim: int = 8
    task_names: Sequence[str] = ("ctr", "cvr")
    num_experts: int = 4
    expert_dims: Sequence[int] = (64, 32)
    tower_dims: Sequence[int] = (32,)
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    def trunk_input(self, inputs: Inputs) -> jnp.ndarray:
        ids = stack_ids(inputs, self.feature_names)
        emb = SharedEmbedding(
            self.vocab_size, self.embed_dim, dtype=self.dtype, mesh=self.mesh, name="emb"
        )(ids)
        parts = [emb.reshape(emb.shape[0], -1)]
        cont = stack_continuous(inputs, self.continuous_names)
        if cont is not None:
            parts.append(cont.astype(parts[0].dtype))
        return jnp.concatenate(parts, axis=-1)

    def tower_logit(self, x: jnp.ndarray, name: str, train: bool) -> jnp.ndarray:
        h = MLP(self.tower_dims, dtype=self.dtype, name=f"{name}_tower")(x, train=train)
        return nn.Dense(1, dtype=self.dtype, name=f"{name}_head")(h).reshape(-1).astype(jnp.float32)


class MMOE(_MultiTaskBase):
    """Multi-gate mixture-of-experts (reference MMOELayer,
    4.MMOE/CustomLayers.py:107-173; cleaner rewrite 9.ESCM2:67-171)."""

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        x = self.trunk_input(inputs)
        experts = ExpertBank(self.num_experts, self.expert_dims, dtype=self.dtype, name="experts")(
            x, train=train
        )  # (B, E, H)
        out: Dict[str, jnp.ndarray] = {}
        for task in self.task_names:
            gate = nn.Dense(self.num_experts, dtype=self.dtype, name=f"{task}_gate")(x)
            gate = nn.softmax(gate.astype(jnp.float32), axis=-1).astype(experts.dtype)
            mixed = jnp.einsum("be,beh->bh", gate, experts)
            logit = self.tower_logit(mixed, task, train)
            out[f"{task}_logit"] = logit
            out[f"{task}_output"] = nn.sigmoid(logit)
        return out


class ESMM(_MultiTaskBase):
    """Entire-space multi-task: pCTCVR = pCTR × pCVR
    (reference ESMMLayer, 4.MMOE/CustomLayers.py:175-245; ctcvr at :243-244).
    The CVR tower is supervised only through the ctcvr product."""

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        x = self.trunk_input(inputs)
        experts = ExpertBank(self.num_experts, self.expert_dims, dtype=self.dtype, name="experts")(
            x, train=train
        )
        shared = jnp.mean(experts, axis=1)
        ctr_logit = self.tower_logit(shared, "ctr", train)
        cvr_logit = self.tower_logit(shared, "cvr", train)
        ctr = nn.sigmoid(ctr_logit)
        cvr = nn.sigmoid(cvr_logit)
        return {
            "ctr_logit": ctr_logit,
            "ctr_output": ctr,
            "cvr_output": cvr,
            "ctcvr_output": ctr * cvr,
        }


class PLE(_MultiTaskBase):
    """Progressive layered extraction: multi-level CGC with task-specific and
    shared expert groups (reference PLELayer call_cgc_net,
    4.MMOE/CustomLayers.py:315-358; param'd rewrite 9.ESCM2:282-435)."""

    num_levels: int = 2
    experts_per_task: int = 2
    shared_experts: int = 2
    return_cgc_output: bool = False

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        x = self.trunk_input(inputs)
        tasks = list(self.task_names)
        streams = {t: x for t in tasks}
        shared_stream = x
        cgc_out: Dict[str, jnp.ndarray] = {}
        for level in range(self.num_levels):
            is_last = level == self.num_levels - 1
            task_expert_outs = {}
            for t in tasks:
                task_expert_outs[t] = ExpertBank(
                    self.experts_per_task, self.expert_dims, dtype=self.dtype,
                    name=f"L{level}_{t}_experts",
                )(streams[t], train=train)
            shared_outs = ExpertBank(
                self.shared_experts, self.expert_dims, dtype=self.dtype,
                name=f"L{level}_shared_experts",
            )(shared_stream, train=train)
            new_streams = {}
            for t in tasks:
                cands = jnp.concatenate([task_expert_outs[t], shared_outs], axis=1)
                gate = nn.Dense(cands.shape[1], dtype=self.dtype, name=f"L{level}_{t}_gate")(
                    streams[t]
                )
                gate = nn.softmax(gate.astype(jnp.float32), axis=-1).astype(cands.dtype)
                new_streams[t] = jnp.einsum("be,beh->bh", gate, cands)
            if not is_last:
                all_outs = jnp.concatenate(
                    [task_expert_outs[t] for t in tasks] + [shared_outs], axis=1
                )
                sgate = nn.Dense(all_outs.shape[1], dtype=self.dtype, name=f"L{level}_shared_gate")(
                    shared_stream
                )
                sgate = nn.softmax(sgate.astype(jnp.float32), axis=-1).astype(all_outs.dtype)
                shared_stream = jnp.einsum("be,beh->bh", sgate, all_outs)
            streams = new_streams
        out: Dict[str, jnp.ndarray] = {}
        for t in tasks:
            logit = self.tower_logit(streams[t], t, train)
            out[f"{t}_logit"] = logit
            out[f"{t}_output"] = nn.sigmoid(logit)
            if self.return_cgc_output:
                out[f"{t}_cgc"] = streams[t]
        return out


class ESM2(_MultiTaskBase):
    """Probability-chain multi-task (reference ESM2Layer,
    9.ESCM2/CustomLayers.py:438-601): click → {action, none} → purchase, with
    per-edge BCEs; returns the scalar total loss in-model ('model_loss').

    The reference's 8-node chain (click→cart/collect/none→order→pay) reduces
    to the nodes observable in the data; with ctr/cvr labels the chain is
    click → action → purchase where p(purchase|impression) =
    pCTR·(pAction·pBuyGivenAction + (1−pAction)·pBuyDirect).
    """

    loss_weights: Sequence[float] = (1.0, 1.0)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        x = self.trunk_input(inputs)
        experts = ExpertBank(self.num_experts, self.expert_dims, dtype=self.dtype, name="experts")(
            x, train=train
        )
        shared = jnp.mean(experts, axis=1)
        ctr_logit = self.tower_logit(shared, "ctr", train)
        action_logit = self.tower_logit(shared, "action", train)
        buy_a_logit = self.tower_logit(shared, "buy_given_action", train)
        buy_d_logit = self.tower_logit(shared, "buy_direct", train)
        p_ctr = nn.sigmoid(ctr_logit)
        p_action = nn.sigmoid(action_logit)
        p_buy = p_action * nn.sigmoid(buy_a_logit) + (1 - p_action) * nn.sigmoid(buy_d_logit)
        ctcvr = p_ctr * p_buy
        out = {
            "ctr_logit": ctr_logit,
            "ctr_output": p_ctr,
            "cvr_output": p_buy,
            "ctcvr_output": ctcvr,
        }
        if "ctr" in inputs:
            ctr_y = inputs["ctr"].reshape(-1)
            cvr_y = inputs["cvr"].reshape(-1)
            loss = jnp.mean(_bce(ctr_y, p_ctr)) * self.loss_weights[0]
            loss = loss + jnp.mean(_bce(cvr_y, ctcvr)) * self.loss_weights[1]
            out["loss"] = loss
        return out


class ESCM2(nn.Module):
    """Entire-space counterfactual multi-task (reference ESCM2Layer,
    9.ESCM2/CustomLayers.py:604-704): PLE/MMOE trunk + counterfactual CVR
    regularizer — IPS (:699-704, clipped ctr propensity with stop_gradient)
    or DR (:687-697, imputation tower on the CGC output). Computes the global
    loss in-model (:684)."""

    feature_names: Sequence[str]
    vocab_size: int
    continuous_names: Sequence[str] = ()
    embed_dim: int = 8
    counterfact_mode: str = "ips"  # 'ips' | 'dr'
    ctr_weight: float = 1.0
    cvr_weight: float = 0.5
    ctcvr_weight: float = 1.0
    propensity_clip: float = 0.05
    trunk: str = "ple"  # 'ple' | 'mmoe'
    dtype: Optional[Any] = None
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        common = dict(
            feature_names=self.feature_names,
            vocab_size=self.vocab_size,
            continuous_names=self.continuous_names,
            embed_dim=self.embed_dim,
            task_names=("ctr", "cvr"),
            dtype=self.dtype,
            mesh=self.mesh,
        )
        if self.trunk == "ple":
            trunk_out = PLE(return_cgc_output=True, name="trunk", **common)(inputs, train=train)
        else:
            trunk_out = MMOE(name="trunk", **common)(inputs, train=train)
        p_ctr = trunk_out["ctr_output"]
        p_cvr = trunk_out["cvr_output"]
        ctcvr = p_ctr * p_cvr
        out = dict(trunk_out) | {"ctcvr_output": ctcvr}
        if "ctr" in inputs:
            o = inputs["ctr"].reshape(-1).astype(jnp.float32)  # click indicator
            r = inputs["cvr"].reshape(-1).astype(jnp.float32)  # conversion
            loss_ctr = jnp.mean(_bce(o, p_ctr))
            loss_ctcvr = jnp.mean(_bce(r, ctcvr))
            # clipped, gradient-stopped propensity (reference :699-704)
            p_hat = jnp.clip(jax_stop_gradient(p_ctr), self.propensity_clip, 1.0)
            e = _bce(r, p_cvr)  # per-sample CVR error
            if self.counterfact_mode == "ips":
                loss_cvr = jnp.mean(o * e / p_hat)
            else:  # doubly robust
                cgc = trunk_out.get("cvr_cgc")
                e_hat = MLP((32, 1), out_activation="linear", dtype=self.dtype, name="imputation")(
                    cgc, train=train
                ).reshape(-1).astype(jnp.float32)
                loss_err = jnp.mean(e_hat + o * (e - e_hat) / p_hat)
                loss_imp = jnp.mean(o * jnp.square(e - e_hat) / p_hat)
                loss_cvr = loss_err + loss_imp
            out["loss"] = (
                self.ctr_weight * loss_ctr
                + self.cvr_weight * loss_cvr
                + self.ctcvr_weight * loss_ctcvr
            )
        return out




class FDN(_MultiTaskBase):
    """Feature-decomposition network (reference FDN4PLELayer,
    9.ESCM2/CustomLayers.py:707-862): PLE whose task-specific experts are
    pushed orthogonal to shared experts per level (build_orth_loss :846-853)
    plus per-expert auxiliary prediction heads (build_level_aux_loss
    :855-862). Total loss computed in-model."""

    num_levels: int = 2
    experts_per_task: int = 2
    shared_experts: int = 2
    orth_weight: float = 0.01
    aux_weight: float = 0.1

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        x = self.trunk_input(inputs)
        tasks = list(self.task_names)
        streams = {t: x for t in tasks}
        shared_stream = x
        orth_terms = []
        aux_logits = []
        for level in range(self.num_levels):
            task_outs = {}
            for t in tasks:
                task_outs[t] = ExpertBank(
                    self.experts_per_task, self.expert_dims, dtype=self.dtype,
                    name=f"L{level}_{t}_experts",
                )(streams[t], train=train)
            shared_outs = ExpertBank(
                self.shared_experts, self.expert_dims, dtype=self.dtype,
                name=f"L{level}_shared_experts",
            )(shared_stream, train=train)
            # orthogonality: cosine² between mean task-specific and mean
            # shared expert outputs at this level
            sh = jnp.mean(shared_outs, axis=1).astype(jnp.float32)
            sh = sh / (jnp.linalg.norm(sh, axis=-1, keepdims=True) + 1e-8)
            for t in tasks:
                sp = jnp.mean(task_outs[t], axis=1).astype(jnp.float32)
                sp = sp / (jnp.linalg.norm(sp, axis=-1, keepdims=True) + 1e-8)
                orth_terms.append(jnp.mean(jnp.square(jnp.sum(sp * sh, axis=-1))))
            # per-expert auxiliary heads
            for t in tasks:
                aux = nn.Dense(1, dtype=self.dtype, name=f"L{level}_{t}_aux")(
                    jnp.mean(task_outs[t], axis=1)
                ).reshape(-1).astype(jnp.float32)
                aux_logits.append((t, aux))
            new_streams = {}
            for t in tasks:
                cands = jnp.concatenate([task_outs[t], shared_outs], axis=1)
                gate = nn.Dense(cands.shape[1], dtype=self.dtype, name=f"L{level}_{t}_gate")(
                    streams[t]
                )
                gate = nn.softmax(gate.astype(jnp.float32), axis=-1).astype(cands.dtype)
                new_streams[t] = jnp.einsum("be,beh->bh", gate, cands)
            if level < self.num_levels - 1:
                all_outs = jnp.concatenate([task_outs[t] for t in tasks] + [shared_outs], axis=1)
                sgate = nn.Dense(all_outs.shape[1], dtype=self.dtype, name=f"L{level}_sgate")(
                    shared_stream
                )
                sgate = nn.softmax(sgate.astype(jnp.float32), axis=-1).astype(all_outs.dtype)
                shared_stream = jnp.einsum("be,beh->bh", sgate, all_outs)
            streams = new_streams
        out: Dict[str, jnp.ndarray] = {}
        for t in tasks:
            logit = self.tower_logit(streams[t], t, train)
            out[f"{t}_logit"] = logit
            out[f"{t}_output"] = nn.sigmoid(logit)
        if "ctr" in inputs:
            labels = {
                "ctr": inputs["ctr"].reshape(-1),
                "cvr": inputs["cvr"].reshape(-1),
            }
            main = sum(
                jnp.mean(_bce(labels[t], out[f"{t}_output"])) for t in tasks
            ) / len(tasks)
            aux = sum(
                jnp.mean(_bce(labels[t], nn.sigmoid(logit))) for t, logit in aux_logits
            ) / max(1, len(aux_logits))
            orth = sum(orth_terms) / max(1, len(orth_terms))
            out["loss"] = main + self.aux_weight * aux + self.orth_weight * orth
            out["orth_loss_value"] = orth
        return out
