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
    """E parallel MLPs evaluated as batched einsums: weights (E, in, out).

    Tensor-parallel over the 'model' mesh axis (SURVEY §2.10 TP row):
    alternating column/row sharding Megatron-style — even layers shard the
    OUTPUT width, odd layers shard the INPUT width — so activations stay
    sharded between layers and GSPMD inserts one reduce at the end instead of
    a reshard per layer. On a 1-device 'model' axis the annotations are
    no-ops."""

    num_experts: int
    hidden_dims: Sequence[int]
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from tpurec.core.mesh import MODEL_AXIS

        # x: (B, D) or (B, E, D) for per-expert streams
        if x.ndim == 2:
            x = jnp.broadcast_to(x[:, None, :], (x.shape[0], self.num_experts, x.shape[-1]))
        for i, width in enumerate(self.hidden_dims):
            w_spec = (
                (None, None, MODEL_AXIS) if i % 2 == 0 else (None, MODEL_AXIS, None)
            )
            b_spec = (None, MODEL_AXIS) if i % 2 == 0 else (None, None)
            w = self.param(
                f"w_{i}",
                nn.with_partitioning(nn.initializers.glorot_uniform(), w_spec),
                (self.num_experts, x.shape[-1], width),
                jnp.float32,
            )
            b = self.param(
                f"b_{i}",
                nn.with_partitioning(nn.initializers.zeros_init(), b_spec),
                (self.num_experts, width),
                jnp.float32,
            )
            x = jnp.einsum("bed,edh->beh", x, jnp.asarray(w).astype(x.dtype)) + jnp.asarray(
                b
            ).astype(x.dtype)
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
    """Full probability-graph multi-task (reference ESM2Layer,
    9.ESCM2/CustomLayers.py:438-601): an 8-task gated expert trunk whose
    conditional-probability heads compose the decomposition

        click   = t0                                   (expose→click)
        cart    = click · t1                           (click→cart)
        collect = click · (1−t1) · t2                  (click→collect)
        none    = click · (1−t1) · (1−t2) · t3         (click→none)
        order   = cart·t4 + collect·t5 + none·t6       ({cart,collect,none}→order)
        pay     = order · t7                           (order→pay)

    with one weighted BCE per labeled node (:559-601). The reference's pay
    edge erroneously reuses t5 (``pay_probs = order_probs*result['task_5']``,
    :594) — intended semantics (t7, the order→pay task) implemented instead
    (SURVEY §7 known-bugs list).

    Labels: 'click','cart','collect','none','order','pay' where present;
    'ctr'/'cvr' alias click/pay so the reduced two-label data of ch.4 still
    trains the chain end-to-end. Unlabeled nodes contribute no loss term.
    Expert mixing per task follows the reference's MMOE-style per-task gates
    (:534-548)."""

    # per-node loss weights in node order click,cart,collect,none,order,pay
    # (reference weight0..weight5, :483)
    loss_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        x = self.trunk_input(inputs)
        experts = ExpertBank(self.num_experts, self.expert_dims, dtype=self.dtype, name="experts")(
            x, train=train
        )  # (B, E, H)
        # 8 conditional-probability tasks, each with its own softmax gate
        task_names = [
            "click", "cart_given_click", "collect_given_no_cart",
            "none_given_no_action", "order_given_cart", "order_given_collect",
            "order_given_none", "pay_given_order",
        ]
        t = {}
        for name in task_names:
            gate = nn.Dense(self.num_experts, dtype=self.dtype, name=f"{name}_gate")(x)
            gate = nn.softmax(gate.astype(jnp.float32), axis=-1).astype(experts.dtype)
            mixed = jnp.einsum("be,beh->bh", gate, experts)
            t[name] = nn.sigmoid(self.tower_logit(mixed, name, train))
        click = t["click"]
        cart = click * t["cart_given_click"]
        collect = click * (1 - t["cart_given_click"]) * t["collect_given_no_cart"]
        none = (
            click
            * (1 - t["cart_given_click"])
            * (1 - t["collect_given_no_cart"])
            * t["none_given_no_action"]
        )
        order = (
            cart * t["order_given_cart"]
            + collect * t["order_given_collect"]
            + none * t["order_given_none"]
        )
        pay = order * t["pay_given_order"]
        out = {
            "ctr_logit": jnp.log(jnp.clip(click, _EPS, 1 - _EPS))
            - jnp.log1p(-jnp.clip(click, _EPS, 1 - _EPS)),
            "ctr_output": click,
            "cart_output": cart,
            "collect_output": collect,
            "none_output": none,
            "order_output": order,
            "pay_output": pay,
            # pCTCVR = p(pay | impression); cvr_output = p(pay | click)
            "cvr_output": pay / jnp.clip(click, _EPS, 1.0),
            "ctcvr_output": pay,
        }
        node_probs = [
            ("click", click), ("cart", cart), ("collect", collect),
            ("none", none), ("order", order), ("pay", pay),
        ]
        # ctr/cvr alias the chain's endpoints for two-label datasets
        labels = {k: inputs[k] for k, _ in node_probs if k in inputs}
        if "click" not in labels and "ctr" in inputs:
            labels["click"] = inputs["ctr"]
        if "pay" not in labels and "cvr" in inputs:
            labels["pay"] = inputs["cvr"]
        if labels:
            loss = jnp.zeros((), jnp.float32)
            for w, (node, probs) in zip(self.loss_weights, node_probs):
                if node in labels:
                    y = labels[node].reshape(-1)
                    loss = loss + w * jnp.mean(_bce(y, probs))
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
    each paired 1:1 with a shared expert and pushed orthogonal per level —
    shared_expert_num = specific_expert_num × num_tasks by construction
    (:748-749), orth loss = mean over batch of Σ_pairs ⟨specific_m, shared_m⟩²
    on the RAW (unnormalized) outputs (build_orth_loss :846-853) — plus
    PER-EXPERT auxiliary prediction heads: every task-specific expert gets its
    own sigmoid head supervised by that task's label (build_level_aux_loss
    :855-862, intended semantics of 'experts should predict the target
    directly'). Total loss computed in-model."""

    num_levels: int = 2
    experts_per_task: int = 2
    orth_weight: float = 0.01
    aux_weight: float = 0.1

    @nn.compact
    def __call__(self, inputs: Inputs, train: bool = False) -> Outputs:
        x = self.trunk_input(inputs)
        tasks = list(self.task_names)
        # pairing constraint (reference :748-749)
        shared_count = self.experts_per_task * len(tasks)
        streams = {t: x for t in tasks}
        shared_stream = x
        orth_terms = []
        aux_logits = []  # (task, (B, E) per-expert logits)
        for level in range(self.num_levels):
            task_outs = {}
            for t in tasks:
                task_outs[t] = ExpertBank(
                    self.experts_per_task, self.expert_dims, dtype=self.dtype,
                    name=f"L{level}_{t}_experts",
                )(streams[t], train=train)
            shared_outs = ExpertBank(
                shared_count, self.expert_dims, dtype=self.dtype,
                name=f"L{level}_shared_experts",
            )(shared_stream, train=train)
            # per-expert paired orthogonality: flat specific (B, T·E, H)
            # against shared (B, T·E, H), raw inner products squared
            specific_flat = jnp.concatenate(
                [task_outs[t] for t in tasks], axis=1
            ).astype(jnp.float32)
            dots = jnp.einsum(
                "bmh,bmh->bm", specific_flat, shared_outs.astype(jnp.float32)
            )
            orth_terms.append(jnp.mean(jnp.sum(jnp.square(dots), axis=1)))
            # per-expert auxiliary heads: one Dense(1) per (level, task, expert)
            for t in tasks:
                w = self.param(
                    f"L{level}_{t}_aux_w",
                    nn.initializers.glorot_uniform(),
                    (self.experts_per_task, task_outs[t].shape[-1]),
                    jnp.float32,
                )
                b = self.param(
                    f"L{level}_{t}_aux_b", nn.initializers.zeros_init(),
                    (self.experts_per_task,), jnp.float32,
                )
                aux = jnp.einsum(
                    "beh,eh->be", task_outs[t].astype(jnp.float32), w
                ) + b  # (B, E)
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
                jnp.mean(_bce(labels[t][:, None], nn.sigmoid(logit)))
                for t, logit in aux_logits  # logit: (B, E) per-expert heads
            ) / max(1, len(aux_logits))
            orth = sum(orth_terms) / max(1, len(orth_terms))
            out["loss"] = main + self.aux_weight * aux + self.orth_weight * orth
            out["orth_loss_value"] = orth
        return out
