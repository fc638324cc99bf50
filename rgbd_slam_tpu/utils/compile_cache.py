"""Persistent XLA compilation cache.

The engine step compiles large fused programs (and Mosaic kernels with slow
lowering); enabling JAX's persistent cache makes every process after the first
start in seconds.  Entry points (bench.py, runner.py, __graft_entry__) call
:func:`enable` before the first jit.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/rgbd_slam_tpu_xla")


def enable(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("RGBD_SLAM_TPU_CACHE", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
