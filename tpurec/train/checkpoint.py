"""Orbax-backed checkpointing.

TPU-native equivalent of the reference's
``tf.train.Checkpoint``/``CheckpointManager(max_to_keep=3)`` + SavedModel
export (2.FM/ModelManager.py:112-119, 287-307): sharding-aware save/restore
of (params, opt_state, model_state, step), keep-best rotation, plus a frozen
msgpack export for serving.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp
from flax import serialization


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, tree: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> list:
        return list(self._mgr.all_steps())

    def restore(self, tree_like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, tree_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self) -> None:
        self._mgr.close()


def export_params(directory: str, params: Any, meta: Optional[dict] = None) -> None:
    """Frozen serving export (the SavedModel-equivalent artifact): params as
    flax msgpack + a JSON meta sidecar (model name/params/schema)."""
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    if meta is not None:
        with open(os.path.join(directory, "export_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)


def load_exported_params(directory: str, target: Any) -> Any:
    with open(os.path.join(directory, "params.msgpack"), "rb") as f:
        return serialization.from_bytes(target, f.read())


def load_exported_raw(directory: str) -> Any:
    """Template-free restore (plain nested dicts of numpy arrays) — for
    grafting an export's subtree into a different model's param tree."""
    with open(os.path.join(directory, "params.msgpack"), "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_export_meta(directory: str) -> dict:
    with open(os.path.join(directory, "export_meta.json")) as f:
        return json.load(f)
