"""Composable loss modules.

The reference hides loss variants inside per-chapter train loops
(SURVEY §3.2): plain BCE (2.FM), 0.5/0.5 dual-task BCE (4.MMOE:174-190),
in-batch sampled-softmax with first-column-positive labels (6.MIND),
0.2*GSU + 0.8*ESU softmax CE (7.SIM/8.DMR), plus model-internal aux losses.
Here each is a named pure function ``loss_fn(outputs, batch) -> (loss, logs)``
selected by TrainConfig.loss; auxiliary losses returned by models
('loss'/'auxiliary_loss' keys) are always added.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax.numpy as jnp
import optax

Array = jnp.ndarray
LossFn = Callable[[Dict[str, Array], Dict[str, Array]], Tuple[Array, Dict[str, Array]]]

_EPS = 1e-7


def _bce_from_outputs(outputs: Dict[str, Array], labels: Array, key: str = "") -> Array:
    """BCE, preferring the raw logit when the model exposes one."""
    logit_key = f"{key}logit" if key else "logit"
    out_key = f"{key}output" if key else "output"
    if logit_key in outputs:
        return jnp.mean(
            optax.sigmoid_binary_cross_entropy(
                outputs[logit_key].reshape(-1).astype(jnp.float32), labels
            )
        )
    p = jnp.clip(outputs[out_key].reshape(-1).astype(jnp.float32), _EPS, 1.0 - _EPS)
    return -jnp.mean(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))


def bce(outputs, batch):
    labels = batch["label"].reshape(-1).astype(jnp.float32)
    loss = _bce_from_outputs(outputs, labels)
    return loss, {"bce": loss}


def multi_task(outputs, batch, weights=(0.5, 0.5)):
    """CTR + CVR weighted BCE (reference 4.MMOE/ModelManager.py:174-190).
    For ESMM-style models the CVR label supervises the ctcvr output."""
    ctr_labels = batch["ctr"].reshape(-1).astype(jnp.float32)
    cvr_labels = batch["cvr"].reshape(-1).astype(jnp.float32)
    ctr_loss = _bce_from_outputs(outputs, ctr_labels, key="ctr_")
    cvr_key = "ctcvr_" if "ctcvr_output" in outputs else "cvr_"
    cvr_loss = _bce_from_outputs(outputs, cvr_labels, key=cvr_key)
    loss = weights[0] * ctr_loss + weights[1] * cvr_loss
    return loss, {"ctr_bce": ctr_loss, "cvr_bce": cvr_loss}


def in_batch_softmax(outputs, batch):
    """Sampled-softmax over [positive ∥ in-batch negatives].

    If the model emitted 'logits' (B, 1+N) the positive is column 0
    (reference convention, 6.MIND/CustomLayers.py:252-261); otherwise logits
    are built from the tower embeddings with in-batch negatives (diagonal
    positive).

    Accidental-hit removal: when the batch carries an 'item_id' column,
    off-diagonal entries whose item equals row i's positive are masked out —
    they are FALSE negatives (the same item another user also clicked), the
    in-batch analogue of tf.nn.sampled_softmax_loss's remove_accidental_hits
    (the sampler the reference trains MIND/ComiRec with,
    6.MIND/CustomLayers.py:853-863). At small corpora the duplicate rate is
    large (e.g. ~30% at B=512 over 1.5k items) and unmasked duplicates
    actively push clicked items apart."""
    if "logits" in outputs:
        logits = outputs["logits"].astype(jnp.float32)
        labels = jnp.zeros(logits.shape[0], dtype=jnp.int32)  # column 0 positive
    else:
        u = outputs["user_embedding"].astype(jnp.float32)
        v = outputs["item_embedding"].astype(jnp.float32)
        logits = u @ v.T
        b = logits.shape[0]
        labels = jnp.arange(b)
        ids = batch.get("item_id")
        if ids is not None:
            ids = ids.reshape(-1)
            dup = (ids[:, None] == ids[None, :]) & ~jnp.eye(b, dtype=bool)
            logits = jnp.where(dup, -1e9, logits)
    loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )
    return loss, {"softmax_ce": loss}


def gsu_esu(outputs, batch, alpha=0.2, beta=0.8):
    """Two-stage long-sequence ranking loss: alpha*GSU + beta*ESU softmax CE
    over 2-class logits (reference 7.SIM/ModelManager.py train_loop)."""
    labels = batch["label"].reshape(-1).astype(jnp.int32)
    gsu = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            outputs["gsu_logits"].astype(jnp.float32), labels
        )
    )
    esu = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            outputs["esu_logits"].astype(jnp.float32), labels
        )
    )
    loss = alpha * gsu + beta * esu
    return loss, {"gsu_ce": gsu, "esu_ce": esu}


def model_loss(outputs, batch):
    """The model computed its own total loss (ESM2/ESCM2/FDN style,
    9.ESCM2/CustomLayers.py:542-601)."""
    loss = jnp.asarray(outputs["loss"], jnp.float32).reshape(())
    return loss, {"model_loss": loss}


LOSSES: Dict[str, LossFn] = {
    "bce": bce,
    "multi_task": multi_task,
    "in_batch_softmax": in_batch_softmax,
    "gsu_esu": gsu_esu,
    "model_loss": model_loss,
}


def get_loss(name: str) -> LossFn:
    if name not in LOSSES:
        raise KeyError(f"unknown loss {name!r}; known: {sorted(LOSSES)}")
    return LOSSES[name]


def add_auxiliary(loss: Array, outputs: Dict[str, Array]) -> Tuple[Array, Dict[str, Array]]:
    """Fold model-side auxiliary losses into the total (reference models
    return 'auxiliary_loss' computed in-layer, e.g. DIEN
    5.DIN/CustomLayers.py:434-453)."""
    logs = {}
    for key in ("auxiliary_loss", "aux_loss", "orth_loss"):
        if key in outputs:
            aux = jnp.asarray(outputs[key], jnp.float32).reshape(())
            loss = loss + aux
            logs[key] = aux
    return loss, logs
