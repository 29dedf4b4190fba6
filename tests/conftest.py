"""Test configuration: CPU backend with a virtual 8-device mesh, x64 enabled.

Multi-chip code paths (shard_map + collectives) run in CI on a simulated
8-device CPU mesh, the standard JAX approach (SURVEY.md §4.6).
"""

import os

# Force the CPU backend for tests even when the session environment points
# JAX at a TPU plugin (JAX_PLATFORMS=axon): tests need the virtual multi-device
# CPU mesh and must not block on a device tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session may pre-register a TPU PJRT plugin via sitecustomize and force
# jax_platforms to "axon,cpu"; reset it so tests never initialize (and never
# block on) the single shared TPU grant.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20250817)
