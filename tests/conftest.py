"""Test configuration: force the CPU backend with a virtual 8-device mesh so tests are
fast and multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

The environment registers an `axon` TPU PJRT plugin via sitecustomize and pins
JAX_PLATFORMS=axon, so we must override through jax.config, not the env var.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1000)
