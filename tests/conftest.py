"""Test configuration: force an 8-virtual-device CPU platform so sharding
(pjit over a ('data','model') Mesh) is exercised without TPU hardware.

Note: the axon sitecustomize registers the TPU plugin at interpreter start and
overrides JAX_PLATFORMS, so the env var alone is not enough — we also set the
platform through jax.config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_trace_time_flags():
    """The sparse-mode and training-phase flags are process globals read at
    TRACE time (CLAUDE.md architecture invariants); a test that sets either
    must not leak it into the next test's traces (ADVICE r4)."""
    yield
    from tpurec.embedding.modules import set_dense_packed_gather, set_sparse_mode
    from tpurec.ops.pallas.kernels import set_training_phase

    set_sparse_mode(False)
    set_dense_packed_gather(False)
    set_training_phase(False)
