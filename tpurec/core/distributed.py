"""Multi-host bootstrap.

On a TPU pod slice each host runs the same program; ``initialize()`` wires up
the jax distributed runtime (single-controller view over all hosts' devices),
after which ``make_mesh()`` sees every chip in the slice and per-host input
feeding uses ``ArrayLoader(host_id=process_index, num_hosts=process_count)``.

The reference has no distribution story (SURVEY §2.10); this is the
TPU-native equivalent of "a communication backend" — jax.distributed for
control, XLA collectives over ICI/DCN for data.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host jax (no-op on a single host). Returns the
    process topology for the input pipeline.

    Must run before ANY backend-initializing jax call (jax.devices, ...) —
    so the already-initialized probe inspects the distributed client state
    directly instead of calling jax.process_count()."""
    from jax._src import distributed as _dist

    already = getattr(_dist.global_state, "client", None) is not None
    if not already and (coordinator_address or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def host_loader_kwargs() -> dict:
    """kwargs for ArrayLoader so each host feeds its own shard of rows."""
    return {"host_id": jax.process_index(), "num_hosts": jax.process_count()}
