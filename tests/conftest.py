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
