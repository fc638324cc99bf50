"""Checkpoint / resume of the full SLAM state.

NEW capability relative to the reference (which has none — SURVEY.md §5: the only
persistence is the streaming map export).  The whole ``SlamState`` pytree (pose, all
feature maps, motion model, tracking bookkeeping, RNG key) round-trips through one
``.npz`` file, so a sequence can be resumed bit-exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_state(state, path: str):
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, n_leaves=len(leaves), **arrays)


def load_state(path: str, template):
    """Load a state saved by :func:`save_state`; ``template`` provides the pytree
    structure (e.g. ``engine.init_state(cam, cfg)`` with the same config)."""
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves_t, treedef = jax.tree.flatten(template)
    if n != len(leaves_t):
        raise ValueError(
            f"checkpoint has {n} leaves, template has {len(leaves_t)} — "
            "config/capacity mismatch")
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)
