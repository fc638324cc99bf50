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


class StripeWallScene(WallScene):
    """Wall with bold straight stripes: strong line structure, weak corner
    texture.  Exercises the line-feature pose path (north-star config 2 —
    'points+lines pose'); the stripe edges are the only high-contrast structure,
    so a points-only run sees far fewer features than a points+lines run."""

    def __init__(self, cam: CameraIntrinsics, wall_x: float = 2800.0,
                 stripe_period: float = 500.0, stripe_width: float = 80.0,
                 seed: int = 0):
        super().__init__(cam, wall_x=wall_x, seed=seed)
        self.period = stripe_period
        self.width = stripe_width

    def texture(self, y, z):
        base = (130.0 + 8.0 * np.sin(y / 900.0) + 6.0 * np.cos(z / 1100.0)
                + self._grid[np.floor(y / self.block).astype(int) % 256,
                             np.floor(z / self.block).astype(int) % 256] * 0.12)
        sy = (np.mod(y, self.period) < self.width)
        sz = (np.mod(z, self.period) < self.width)
        return base - 70.0 * sy - 50.0 * sz


class TunnelScene:
    """Camera inside a textured cylindrical tunnel whose axis is world x
    (forward) — the CAPE-tunnel analogue (reference README.md:90-100)."""

    def __init__(self, cam: CameraIntrinsics, radius_mm: float = 1500.0,
                 center_yz=(0.0, 0.0), block_mm: float = 80.0, seed: int = 2):
        self.cam = cam
        self.r = radius_mm
        self.cy, self.cz = center_yz
        self.block = block_mm
        self._grid = np.random.default_rng(seed).uniform(
            40, 220, (256, 256)).astype(np.float32)

    def texture(self, x, ang):
        xi = np.floor(x / self.block).astype(int) % 256
        ai = np.floor(ang / (2 * np.pi) * 160).astype(int) % 256
        return (self._grid[xi, ai]
                + 12 * np.sin(x / 180.0) + 8 * np.cos(3.0 * ang))

    def render(self, quat, position):
        cam = self.cam
        c2w = _c2w_numpy(quat, position)
        origin, rot = c2w[:3, 3], c2w[:3, :3]
        us, vs = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
        d = np.stack([(us - cam.cx) / cam.fx, (vs - cam.cy) / cam.fy,
                      np.ones_like(us, dtype=np.float64)], -1)
        dw = d @ rot.T
        # |(o + t d) - c|^2 = r^2 in the world (y, z) plane
        oy, oz = origin[1] - self.cy, origin[2] - self.cz
        a = dw[..., 1] ** 2 + dw[..., 2] ** 2
        b = 2.0 * (oy * dw[..., 1] + oz * dw[..., 2])
        c = oy * oy + oz * oz - self.r * self.r
        disc = np.maximum(b * b - 4 * a * c, 0.0)
        a_safe = np.where(np.abs(a) < 1e-12, 1e-12, a)
        t = (-b + np.sqrt(disc)) / (2 * a_safe)
        t = np.where((np.abs(a) < 1e-12) | (t <= 100.0), 0.0, t)
        w = origin + t[..., None] * dw
        ang = np.arctan2(w[..., 2] - self.cz, w[..., 1] - self.cy)
        gray = self.texture(w[..., 0], ang).astype(np.float32)
        return np.where(t > 0, gray, 0.0).astype(np.float32), \
            t.astype(np.float32)


class RoomScene:
    """Three mutually orthogonal textured planes (front wall, side wall, floor)
    — a structured scene for full-trajectory ATE benchmarks with rotation."""

    def __init__(self, cam: CameraIntrinsics, front_x: float = 3000.0,
                 side_y: float = 1800.0, floor_z: float = -1200.0,
                 block_mm: float = 60.0, seed: int = 1,
                 depth_noise=None):
        self.cam = cam
        self.front_x, self.side_y, self.floor_z = front_x, side_y, floor_z
        self.block = block_mm
        self._grids = [np.random.default_rng(seed + i).uniform(
            40, 220, (256, 256)).astype(np.float32) for i in range(3)]
        self.depth_noise = depth_noise  # optional DepthNoiseModel
        self._noise_rng = np.random.default_rng(seed + 99)

    def _tex(self, i, a, b):
        ai = np.floor(a / self.block).astype(int) % 256
        bi = np.floor(b / self.block).astype(int) % 256
        return (self._grids[i][ai, bi]
                + 14 * np.sin(a / 150.0) + 9 * np.cos(b / 130.0))

    def render(self, quat, position):
        cam = self.cam
        c2w = _c2w_numpy(quat, position)
        origin, rot = c2w[:3, 3], c2w[:3, :3]
        us, vs = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
        d = np.stack([(us - cam.cx) / cam.fx, (vs - cam.cy) / cam.fy,
                      np.ones_like(us, dtype=np.float64)], -1)
        dw = d @ rot.T

        def hit(axis, value):
            dirc = dw[..., axis]
            t = (value - origin[axis]) / np.where(np.abs(dirc) < 1e-12,
                                                  1e-12, dirc)
            return np.where((np.abs(dirc) < 1e-12) | (t <= 100.0), np.inf, t)

        t0 = hit(0, self.front_x)
        t1 = hit(1, self.side_y)
        t2 = hit(2, self.floor_z)
        ts = np.stack([t0, t1, t2])
        best = np.argmin(ts, axis=0)
        t = np.take_along_axis(ts, best[None], axis=0)[0]
        w = origin + t[..., None] * dw
        gray = np.where(
            best == 0, self._tex(0, w[..., 1], w[..., 2]),
            np.where(best == 1, self._tex(1, w[..., 0], w[..., 2]),
                     self._tex(2, w[..., 0], w[..., 1]))).astype(np.float32)
        depth = np.where(np.isfinite(t), t, 0.0).astype(np.float32)
        if self.depth_noise is not None:
            q = (self.depth_noise.quadratic * depth * depth
                 + self.depth_noise.linear * depth + self.depth_noise.constant)
            sigma = np.maximum(q, self.depth_noise.floor_mm)
            depth = np.where(
                depth > 0,
                depth + sigma * self._noise_rng.standard_normal(depth.shape)
                .astype(np.float32), 0.0).astype(np.float32)
        return gray, depth


def _quat_from_euler(yaw, pitch, roll):
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    return np.array([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ], np.float32)


def orbit_trajectory(n_frames: int, speed_mm: float = 4.0,
                     yaw_rate_d: float = 0.05, pitch_rate_d: float = 0.02):
    """6-DoF ground truth: lateral+forward translation with slow yaw/pitch
    rotation (the full-trajectory bench's rotating analogue of fr1 motion)."""
    poses = []
    for i in range(n_frames):
        yaw = np.radians(yaw_rate_d) * i
        pitch = np.radians(pitch_rate_d) * i
        quat = _quat_from_euler(yaw, pitch, 0.0)
        pos = np.array([1.5 * i, speed_mm * i, 0.4 * speed_mm * i], np.float32)
        poses.append((quat, pos))
    return poses


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
