"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding (dp/tp) is exercised without TPU hardware via
XLA's host-platform device partitioning (SURVEY.md §4 distributed seam).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize re-pins JAX_PLATFORMS to the hardware plugin at
# interpreter startup; the config flag below wins over it.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
