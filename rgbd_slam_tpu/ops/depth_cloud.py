"""Depth image -> organized camera-space point cloud (+ cell reorganization).

Replaces the reference Depth_Map_Transformation
(src/features/primitives/depth_map_transformation.cpp): the precomputed per-pixel
back-projection factors ``_Xpre/_Ypre`` (:147-173) become a closed-form broadcast, the
TBB row loop (:89-142) a single fused elementwise op, and the cell-reorder map a
reshape/transpose that makes each ``patch x patch`` cell contiguous for the CAPE
plane-fitting kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics


@partial(jax.jit, static_argnames=("cam", "min_depth", "max_depth"))
def depth_to_cloud(depth_mm, cam: CameraIntrinsics,
                   min_depth: float = 40.0, max_depth: float = 6000.0):
    """[H, W] depth (mm) -> ([H, W, 3] camera-space cloud in mm, [H, W] valid mask).

    Invalid depths produce zero points (the reference writes zeros too,
    depth_map_transformation.cpp:104-119)."""
    h, w = depth_mm.shape
    dt = depth_mm.dtype
    ys = jax.lax.broadcasted_iota(dt, (h, w), 0)
    xs = jax.lax.broadcasted_iota(dt, (h, w), 1)
    x_pre = (xs - cam.cx) / cam.fx
    y_pre = (ys - cam.cy) / cam.fy
    valid = (depth_mm > min_depth) & (depth_mm <= max_depth)
    z = jnp.where(valid, depth_mm, 0.0)
    cloud = jnp.stack([x_pre * z, y_pre * z, z], axis=-1)
    return cloud, valid


def organize_by_cells(arr, patch: int = 20):
    """[H, W, C] -> [n_cells, patch*patch, C] with each depth-patch cell contiguous
    (reference: the ``_cellMap`` reorder, depth_map_transformation.cpp:147-173).
    H and W must be divisible by ``patch`` (640x480 / 20 -> 32x24=768 cells)."""
    h, w = arr.shape[:2]
    c = arr.shape[2] if arr.ndim == 3 else 1
    gh, gw = h // patch, w // patch
    x = arr.reshape(gh, patch, gw, patch, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(gh * gw, patch * patch, c)


def rectify_depth(depth_mm, depth_cam: CameraIntrinsics, rgb_cam: CameraIntrinsics,
                  depth_to_rgb_44):
    """Reproject the depth map from the depth camera to the RGB camera frame
    (reference: Depth_Map_Transformation::rectify_depth,
    depth_map_transformation.cpp:23-87).  Scatter-based forward warp keeping the
    nearest depth per target pixel."""
    h, w = depth_mm.shape
    dt = depth_mm.dtype
    cloud, valid = depth_to_cloud(depth_mm, depth_cam)
    m = jnp.asarray(depth_to_rgb_44, dtype=dt)
    pts = jnp.einsum("ij,hwj->hwi", m[:3, :3], cloud) + m[:3, 3]
    z = jnp.maximum(pts[..., 2], 1e-6)
    u = (rgb_cam.fx * pts[..., 0] / z + rgb_cam.cx + 0.5).astype(jnp.int32)
    v = (rgb_cam.fy * pts[..., 1] / z + rgb_cam.cy + 0.5).astype(jnp.int32)
    ok = valid & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    u = jnp.where(ok, u, 0)
    v = jnp.where(ok, v, 0)
    flat_idx = v * w + u
    big = jnp.asarray(jnp.inf, dtype=dt)
    out = jnp.full((h * w,), big, dtype=dt)
    out = out.at[flat_idx].min(jnp.where(ok, pts[..., 2], big))
    out = jnp.where(jnp.isinf(out), 0.0, out)
    return out.reshape(h, w)
