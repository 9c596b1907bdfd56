"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` — every Mesh/pjit test runs the real
SPMD partitioner over 8 virtual devices (the standard JAX trick for testing
multi-chip programs on one host). Must run before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize pre-reads JAX_PLATFORMS (axon/TPU); override it
# post-import — the backend is not initialized until first use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
