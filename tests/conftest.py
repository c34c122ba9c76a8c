"""Test configuration: run every test on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host-platform fake devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), matching how the
driver dry-runs the multi-chip path.  Must be set before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform regardless of
# JAX_PLATFORMS; override the config before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
