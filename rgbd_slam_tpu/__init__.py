"""TPU-native RGB-D SLAM engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of BaptisteHudyma/RGB-D-SLAM for TPU
hardware: batched, masked, fixed-capacity array programming instead of per-feature
object graphs; Pallas kernels for the hot image ops; pjit/shard_map over device meshes
for the distributed bundle-adjustment backend.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: Mosaic/XLA lowering of the larger kernels takes
# minutes on a cold process; the cache amortizes it across runs.  v2: the
# original directory accumulated a corrupt entry (concurrent writers) whose
# deserialization SEGFAULTS, so the namespace is versioned to abandon it.
_cache_dir = _os.environ.get("RGBD_SLAM_JAX_CACHE",
                             _os.path.join(_os.path.dirname(__file__), "..",
                                           ".jax_cache", "v2"))
try:
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# TPU MXU default matmul precision is bf16; the SLAM pipeline's small-matrix algebra
# (4x4 transforms, covariance propagation, Kalman/LM solves) needs true f32.  Hot
# kernels that want bf16 request it explicitly via ``preferred_element_type`` /
# ``precision`` arguments, so this default costs nothing where it matters.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
