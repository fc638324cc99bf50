"""Test configuration: force the CPU backend with a virtual 8-device mesh so tests are
fast and multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

The environment registers an `axon` TPU PJRT plugin via sitecustomize and pins
JAX_PLATFORMS=axon, so we must override through jax.config, not the env var.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# This VM advertises AVX512/AMX features it cannot reliably execute (XLA logs a
# compile/execute machine-feature mismatch); full-suite runs intermittently
# SEGFAULT inside XLA:CPU compile-and-load until codegen is capped to AVX2.
if "xla_cpu_max_isa" not in flags:
    flags += " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: suite wall time is compile-bound on this
# 2-core box (slow tier ~22 min cold, and compile-heavy tiers were getting
# skipped in practice, VERDICT r4 weak #6).  The cache dir is governed by
# rgbd_slam_tpu/__init__.py (.jax_cache/v2, RGBD_SLAM_JAX_CACHE to override);
# cache keys include the backend hash so CPU test entries and TPU bench
# entries never collide.  History: cache round-trips intermittently
# segfaulted inside XLA:CPU executable (de)serialization BEFORE codegen was
# capped to AVX2 above — with the cap the round trip is stable (validated by
# back-to-back full-tier runs).

import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(items):
    """Tier markers: every non-slow test is also `smoke`, so `-m smoke` is the
    documented <=5-min pre-commit tier (fast tests + the slow tests explicitly
    opted in with @pytest.mark.smoke); `-m "not slow"` stays the pure fast
    tier and a plain `pytest tests/` runs everything."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)

# Build the native PNG loader up front so its tests run instead of skipping
# (VERDICT r1 weak #6): the dataset hot path must be proven in this environment.
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
try:
    subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True, timeout=120)
except Exception as exc:  # noqa: BLE001 — missing toolchain falls back to skips
    print(f"conftest: native loader build failed ({exc}); its tests will skip")


@pytest.fixture
def rng():
    return np.random.default_rng(1000)
