"""Synthetic RGB-D scene rendering for tests and benchmarks.

No public TUM/CAPE data is available in this environment (zero egress), so the bench
and end-to-end tests render analytic scenes with exact ground-truth poses: a
corner-rich block-textured wall (plus optional side wall) seen from a moving camera.
"""

from __future__ import annotations

import numpy as np

from .config import CameraIntrinsics
from .geometry.se3 import AXIS_CORRECTION


def _c2w_numpy(quat, position):
    """Host-side camera->world matrix (pure numpy: the renderer must not touch the
    device — a single eager jax op chain costs minutes of remote compile here)."""
    w, x, y, z = [float(v) for v in quat]
    r = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    m = np.eye(4)
    m[:3, :3] = AXIS_CORRECTION @ r
    m[:3, 3] = AXIS_CORRECTION @ np.asarray(position, dtype=np.float64)
    return m


class WallScene:
    """Textured wall at world x = wall_x (world x is forward)."""

    def __init__(self, cam: CameraIntrinsics, wall_x: float = 2800.0,
                 block_mm: float = 60.0, seed: int = 0):
        self.cam = cam
        self.wall_x = wall_x
        self.block = block_mm
        self._grid = np.random.default_rng(seed).uniform(
            40, 220, (256, 256)).astype(np.float32)

    def texture(self, y, z):
        yi = np.floor(y / self.block).astype(int) % 256
        zi = np.floor(z / self.block).astype(int) % 256
        return (self._grid[yi, zi]
                + 15 * np.sin(y / 140.0) + 10 * np.cos(z / 170.0))

    def render(self, quat, position):
        """Returns (gray [H,W] f32, depth_mm [H,W] f32)."""
        cam = self.cam
        c2w = _c2w_numpy(quat, position)
        origin, rot = c2w[:3, 3], c2w[:3, :3]
        us, vs = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
        d = np.stack([(us - cam.cx) / cam.fx, (vs - cam.cy) / cam.fy,
                      np.ones_like(us, dtype=np.float64)], -1)
        dw = d @ rot.T
        t = (self.wall_x - origin[0]) / dw[..., 0]
        w = origin + t[..., None] * dw
        gray = self.texture(w[..., 1], w[..., 2]).astype(np.float32)
        return gray, t.astype(np.float32)


def lateral_trajectory(n_frames: int, speed_mm: float = 4.0):
    """Ground-truth poses: lateral + slight forward translation."""
    poses = []
    for i in range(n_frames):
        quat = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
        pos = np.array([1.5 * i, speed_mm * i, 0.0], np.float32)
        poses.append((quat, pos))
    return poses


def render_sequence(cam: CameraIntrinsics, n_frames: int, speed_mm: float = 4.0,
                    seed: int = 0):
    """Returns (frames [(gray, depth)], gt_positions [N,3] mm)."""
    scene = WallScene(cam, seed=seed)
    poses = lateral_trajectory(n_frames, speed_mm)
    frames = [scene.render(q, p) for q, p in poses]
    gt = np.stack([p for _, p in poses])
    return frames, gt
