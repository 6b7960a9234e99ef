"""Device-mesh bootstrap and sharding helpers.

The reference is strictly single-device, single-process eager TF (SURVEY §2.10):
there is no counterpart to this module. The TPU-native design uses one global
2-D logical mesh:

    ('data', 'model')

- batch dimensions shard over 'data' (pure data parallelism for dense towers)
- embedding-table rows and wide expert matmuls shard over 'model'
- collectives (psum for gradient DP, psum/all_gather inside the embedding
  lookup) are inserted by XLA GSPMD from the shardings declared here.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpurec.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """A mesh plus the canonical shardings used throughout the framework."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def n_model(self) -> int:
        return self.mesh.shape[MODEL_AXIS]

    @property
    def n_devices(self) -> int:
        return self.n_data * self.n_model

    # -- canonical shardings ------------------------------------------------
    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    @property
    def batch(self) -> NamedSharding:
        """Leading batch dim over 'data'; everything else replicated."""
        return self.sharding(DATA_AXIS)

    @property
    def table_rows(self) -> NamedSharding:
        """Embedding table (V, D): rows sharded over 'model'."""
        return self.sharding(MODEL_AXIS, None)

    @property
    def table_cols(self) -> NamedSharding:
        return self.sharding(None, MODEL_AXIS)


def make_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshContext:
    """Build the global ('data', 'model') mesh.

    ``config.data == -1`` means "all remaining devices after carving out the
    model axis". On a single chip this degenerates to a (1, 1) mesh, so every
    sharding becomes a no-op and the same code runs unmodified.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, config.model)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return MeshContext(mesh=Mesh(arr, (DATA_AXIS, MODEL_AXIS)))


def local_batch_size(global_batch: int, ctx: MeshContext) -> int:
    if global_batch % ctx.n_data != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {ctx.n_data}"
        )
    return global_batch // ctx.n_data


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)
