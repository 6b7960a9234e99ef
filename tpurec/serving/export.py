"""Load a frozen export back into a servable model.

The export (tpurec.train.checkpoint.export_params) is the SavedModel
equivalent: params.msgpack + export_meta.json. ``load_servable`` rebuilds the
model from the registry and returns jitted callables for ranking and (when
the model has towers) retrieval.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from tpurec.config import EmbeddingConfig, ModelConfig
from tpurec.data.schema import DataInfo
from tpurec.models import build_model
from tpurec.train.checkpoint import load_export_meta, load_exported_params


class Servable:
    def __init__(self, model, variables):
        from tpurec.ops.pallas.kernels import set_training_phase

        self.model = model
        self.variables = variables

        def _infer_apply(batch, **kw):
            # runs at TRACE time inside each jit: serving must dispatch the
            # fused inference forwards even when a train-step trace earlier in
            # the process left the phase flag at True (ADVICE r4)
            set_training_phase(False)
            return self.model.apply(self.variables, batch, **kw)

        self._rank = jax.jit(lambda batch: _infer_apply(batch, train=False)["output"])
        self._full = jax.jit(lambda batch: _infer_apply(batch, train=False))
        self.user_tower: Optional[Callable] = None
        self.item_tower: Optional[Callable] = None
        if hasattr(model, "user_embedding"):
            self.user_tower = jax.jit(
                lambda batch: _infer_apply(batch, method=self.model.user_embedding)
            )
            self.item_tower = jax.jit(
                lambda batch: _infer_apply(batch, method=self.model.item_embedding)
            )

    def rank(self, batch: Dict) -> jnp.ndarray:
        return self._rank({k: jnp.asarray(v) for k, v in batch.items()})

    def predict(self, batch: Dict) -> Dict:
        return self._full({k: jnp.asarray(v) for k, v in batch.items()})


def load_servable(export_dir: str, info: DataInfo) -> Servable:
    meta = load_export_meta(export_dir)
    config = ModelConfig(
        name=meta["model"],
        params=meta.get("model_params", {}),
        embedding=EmbeddingConfig.from_dict(meta.get("embedding", {})),
    )
    model = build_model(config, info)
    # build an abstract target tree by initializing with dummy inputs is
    # heavy; flax.serialization can restore into a None target as raw dicts —
    # but we need the tree structure, so initialize with zeros-shaped inputs.
    sample = _dummy_batch(info)
    variables = model.init(jax.random.key(0), sample)
    from flax import linen as nn

    variables = nn.unbox(variables)
    params = dict(variables)
    params.pop("regularization", None)  # init-time sow, never exported
    loaded = load_exported_params(
        export_dir, {"params": params.pop("params"), "model_state": params}
    )
    merged = {"params": loaded["params"], **loaded["model_state"]}
    return Servable(model, merged)


def _dummy_batch(info: DataInfo, batch: int = 2) -> Dict[str, jnp.ndarray]:
    import numpy as np

    out = {}
    for name, off in zip(info.feature_names, info.feature_offsets):
        out[name] = jnp.asarray(np.full((batch,), off, np.int64))
    for name in info.continuous_names:
        out[name] = jnp.zeros((batch,), jnp.float32)
    for name in info.sequence_names:
        out[name] = jnp.full((batch, max(1, info.max_seq_length)), info.padding_index, jnp.int64)
    return out
