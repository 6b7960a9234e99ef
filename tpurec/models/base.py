"""Model contract and shared helpers.

Every model is a flax Module whose
``__call__(inputs: dict[str, Array], train: bool) -> dict[str, Array]``
returns named outputs — ``'output'`` (probability) at minimum, multi-task
models add ``'ctr_output'``/``'cvr_output'``, retrieval models add tower
embeddings, sequence rankers may add ``'loss'``/``'auxiliary_loss'``. This is
the same contract as the reference layers (SURVEY §1-L2) so a reference user
finds the same output keys.

Inputs: per-feature arrays keyed by feature name — categorical (B,), ids
already offset-encoded into the shared id space; continuous (B,) float;
behavior sequences (B, L) int padded with ``padding_index``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp

Array = jnp.ndarray
Inputs = Dict[str, Array]
Outputs = Dict[str, Array]


def stack_ids(inputs: Inputs, names: Sequence[str]) -> Array:
    """(B, F) int tensor from scalar categorical features."""
    return jnp.stack([inputs[n].reshape(-1) for n in names], axis=1)


def stack_continuous(inputs: Inputs, names: Sequence[str]) -> Optional[Array]:
    if not names:
        return None
    return jnp.stack(
        [inputs[n].reshape(-1).astype(jnp.float32) for n in names], axis=1
    )


def binary_output(logit: Array) -> Outputs:
    """Standard binary head: keep the fp32 logit for the loss, expose the
    probability as 'output' (reference models return the sigmoided value)."""
    logit = logit.reshape(-1).astype(jnp.float32)
    return {"logit": logit, "output": jnp.clip(jnp.asarray(jnp.reciprocal(1.0 + jnp.exp(-logit))), 0.0, 1.0)}


def cosine_similarity(a: Array, b: Array, eps: float = 1e-8) -> Array:
    a_n = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b_n = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.sum(a_n * b_n, axis=-1)


def sequence_mask(seq_ids: Array, padding_index: int = 0) -> Array:
    """(B, L) float mask, 1 where the step is a real id (reference builds the
    same mask from the padding index, 5.DIN/CustomLayers.py:256)."""
    return (seq_ids != padding_index).astype(jnp.float32)


def series_mask(inputs: Inputs, name: str, padding_index: int = 0) -> Array:
    """(B, L) validity mask for the behavior series ``name``.

    Prefers a trainer-provided ``__mask__<name>`` override: the fused sparse
    engine rewrites every id column into row-position space (identity aranges,
    Trainer._build_fused_train_step), which destroys the padding-index
    sentinel — the trainer ships the original mask alongside instead. Without
    an override this is the plain padding-index mask."""
    m = inputs.get(f"__mask__{name}") if hasattr(inputs, "get") else None
    if m is not None:
        return m.astype(jnp.float32)
    return sequence_mask(inputs[name], padding_index)


def embed_series(emb, inputs: Inputs, names: Sequence[str], padding_index: int = 0):
    """Concat-embed parallel behavior series into one (B, L, F·D) block with
    the (B, L) mask from the first series (all series are aligned per event —
    the reference stacks its behavior_series_features the same way,
    6.MIND/CustomLayers.py:199-240, 5.DIN/CustomLayers.py:258-263)."""
    mask = series_mask(inputs, names[0], padding_index)
    embs = [emb(inputs[n]) for n in names]  # each (B, L, D)
    keys = jnp.concatenate(embs, axis=-1) if len(embs) > 1 else embs[0]
    return keys, mask
