"""Model registry: string name → builder.

Replaces the per-chapter ``make_layer_choice`` registries
(2.FM/ModelManager.py:61-84, 3.DCN/ModelManager.py:64-97, ...) with one
global table covering every model family. Builders receive the model params
dict, the DataInfo schema, and an optional Mesh.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from flax import linen as nn
from jax.sharding import Mesh

from tpurec.config import ModelConfig
from tpurec.data.schema import DataInfo

Builder = Callable[[dict, DataInfo, Optional[Mesh]], nn.Module]

MODEL_REGISTRY: Dict[str, Builder] = {}


def register_model(name: str):
    def deco(fn: Builder) -> Builder:
        if name in MODEL_REGISTRY:
            raise ValueError(f"duplicate model name {name!r}")
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


def build_model(
    config: ModelConfig, info: DataInfo, mesh: Optional[Mesh] = None
) -> nn.Module:
    _ensure_populated()
    if config.name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {config.name!r}; known: {sorted(MODEL_REGISTRY)}"
        )
    params = dict(config.params)
    if config.embedding.dim and "embed_dim" not in params:
        params["embed_dim"] = config.embedding.dim
    return MODEL_REGISTRY[config.name](params, info, mesh)


_POPULATED = False


def _ensure_populated() -> None:
    global _POPULATED
    if _POPULATED:
        return
    # import for registration side effects
    from tpurec.models import builders  # noqa: F401

    _POPULATED = True
