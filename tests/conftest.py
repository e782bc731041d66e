"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Sharding/multi-host behavior is tested without TPU hardware via
xla_force_host_platform_device_count, the analog of the reference's sw_emu
Vitis target (functional emulation without the card, Makefile:114-138).
Pallas kernels run in interpreter mode on CPU (auto-detected).
"""

import os

# The axon environment pre-imports jax from sitecustomize, so JAX_PLATFORMS
# is already latched — update the live config instead of the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
