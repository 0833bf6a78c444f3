"""Test configuration: force an 8-device virtual CPU mesh.

Tests validate numerics against torch CPU oracles and sharding against a
virtual multi-device mesh, so they must not grab the TPU. Env vars are set
before anything imports jax.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize registers a TPU backend and force-sets
# jax.config.jax_platforms programmatically, which overrides JAX_PLATFORMS.
# Re-pin to CPU before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
