"""Host-offloaded Adam moments for sparse embedding tables.

The last memory frontier for giant tables: `sparse_adam` keeps O(2·V·D) fp32
moments in HBM, `rowwise_adam` factors that to ~0.53× — this module moves the
moments to host DRAM entirely, so device memory holds ONLY the (V, D) table.
Per step, the touched rows' aggregated gradients (U, D) ship to the host
inside an ordered `io_callback`; the host applies lazy-Adam math against its
numpy moment arrays and returns the row deltas, which the device scatters
into the table. Traffic is O(U·D) down + O(U·D) up over PCIe — the standard
production trade for tables whose optimizer state can't fit HBM (host-side
embedding optimizers in large-scale recsys; the reference's eager TF loop
never faces this, its tables are toy-scale — 2.FM/CustomLayers.py keeps
everything in one process).

Math parity: identical to `sparse.sparse_adam` (lazy Adam on touched rows,
bias-corrected, duplicates routed to the sacrificial pad row) — asserted by
tests/test_host_offload.py against both the numpy oracle and the device
implementation.

Checkpointing: the moments live OUTSIDE the jit state. `HostAdamStore`
exposes `state_dict()` / `load_state_dict()`; the Trainer saves/restores it
next to the Orbax checkpoint (see Trainer.save/restore).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback


class HostAdamState(NamedTuple):
    """Device-side stand-in for one table's optimizer state: just the slot
    index into the process-level `HostAdamStore`. Zero device memory for
    moments (vs 2·V·D for `SparseAdamState`)."""

    slot: jnp.ndarray  # scalar int32


class HostAdamStore:
    """Process-level store of per-table fp32 Adam moments in host memory.

    One instance per Trainer. NOT thread-safe across concurrent training
    loops (one jitted step stream is the supported mode; `ordered=True` on
    the callback serializes updates within it).
    """

    def __init__(self) -> None:
        self._m: List[np.ndarray] = []
        self._v: List[np.ndarray] = []

    def register(self, shape: Tuple[int, ...]) -> int:
        """Allocate host moments for one (V, ...) table; returns its slot."""
        self._m.append(np.zeros(shape, np.float32))
        self._v.append(np.zeros(shape, np.float32))
        return len(self._m) - 1

    @property
    def num_tables(self) -> int:
        return len(self._m)

    def nbytes(self) -> int:
        return sum(a.nbytes for a in self._m) + sum(a.nbytes for a in self._v)

    # -------------------------------------------------------------- persist
    def state_dict(self) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for i, (m, v) in enumerate(zip(self._m, self._v)):
            out[f"m_{i}"] = m
            out[f"v_{i}"] = v
        return out

    def load_state_dict(self, state: Dict[str, np.ndarray]) -> None:
        n = len([k for k in state if k.startswith("m_")])
        self._m = [np.asarray(state[f"m_{i}"], np.float32) for i in range(n)]
        self._v = [np.asarray(state[f"v_{i}"], np.float32) for i in range(n)]

    def save(self, path: str) -> None:
        np.savez(path, **self.state_dict())

    def load(self, path: str) -> None:
        with np.load(path) as z:
            self.load_state_dict(dict(z))

    # -------------------------------------------------------------- update
    def _callback(
        self,
        slot: np.ndarray,
        uniq: np.ndarray,
        grad_rows: np.ndarray,
        step: np.ndarray,
        lr: np.ndarray,
        b1: np.ndarray,
        b2: np.ndarray,
        eps: np.ndarray,
    ) -> np.ndarray:
        """Lazy-Adam row update against host moments; returns row deltas.

        Same math as sparse.sparse_adam. Duplicate pad entries in `uniq`
        last-write-win into the sacrificial row (matching `.at[].set`)."""
        i = int(slot)
        m, v = self._m[i], self._v[i]
        g = np.asarray(grad_rows, np.float32)
        idx = np.asarray(uniq)
        m_new = b1 * m[idx] + (1.0 - b1) * g
        v_new = b2 * v[idx] + (1.0 - b2) * np.square(g)
        m[idx] = m_new
        v[idx] = v_new
        t = np.float32(step)
        m_hat = m_new / (1.0 - b1**t)
        v_hat = v_new / (1.0 - b2**t)
        return np.asarray(lr * m_hat / (np.sqrt(v_hat) + eps), np.float32)

    def update(
        self,
        table: jnp.ndarray,
        state: HostAdamState,
        uniq: jnp.ndarray,
        grad_rows: jnp.ndarray,
        step: jnp.ndarray,
        lr: float,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-7,
    ) -> Tuple[jnp.ndarray, HostAdamState]:
        """Jit-safe table update: moments round-trip through the host.

        `ordered=True` pins the callback into program order so the host
        mutation happens exactly once per executed step (never reordered or
        elided by XLA)."""
        g32 = grad_rows.astype(jnp.float32)
        delta = io_callback(
            self._callback,
            jax.ShapeDtypeStruct(g32.shape, jnp.float32),
            state.slot,
            uniq,
            g32,
            step,
            jnp.float32(lr),
            jnp.float32(b1),
            jnp.float32(b2),
            jnp.float32(eps),
            ordered=True,
        )
        rows = jnp.take(table, uniq, axis=0) - delta.astype(table.dtype)
        return table.at[uniq].set(rows), state
