"""Test configuration: run JAX on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/collective paths are
validated on the host platform with 8 virtual devices (the TPU-native answer
to multi-device testing without a cluster). Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize imports jax at interpreter start (capturing
# JAX_PLATFORMS=axon), so the env var alone is too late — update the config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
