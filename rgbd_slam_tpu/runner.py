"""Sequence runner: drive the engine over a dataset, record trajectory + timings.

Replaces the reference example apps' main loops (examples/main_TUM.cpp:230-310):
frame loop, per-stage timing statistics (the reference's show_statistics parity,
rgbd_slam.cpp:325-347), trajectory capture, ATE evaluation and map export.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import engine
from .config import CameraIntrinsics, SlamConfig
from .io.trajectory import Trajectory, ate_rmse


@dataclass
class RunStats:
    """Wall-clock accounting (reference: per-class _mean*Duration members +
    show_statistics, rgbd_slam.cpp:325-347)."""
    frame_count: int = 0
    success_count: int = 0
    lost_count: int = 0
    total_step_s: float = 0.0
    total_host_s: float = 0.0
    compile_s: float = 0.0

    @property
    def mean_step_ms(self):
        n = max(self.frame_count - 1, 1)  # exclude the compile frame
        return 1000.0 * (self.total_step_s - self.compile_s) / n

    @property
    def fps(self):
        ms = self.mean_step_ms
        return 1000.0 / ms if ms > 0 else 0.0

    def summary(self) -> str:
        return (f"frames={self.frame_count} success={self.success_count} "
                f"lost={self.lost_count} mean_step={self.mean_step_ms:.1f}ms "
                f"fps={self.fps:.1f}")


def run_frames(frames, cam: CameraIntrinsics, cfg: SlamConfig,
               with_planes: bool = True, seed: int = 0,
               state: engine.SlamState | None = None,
               on_frame=None):
    """Run the engine over an iterable of (gray, depth[, timestamp]) frames.

    Returns (final_state, Trajectory, RunStats)."""
    if state is None:
        state = engine.init_state(cam, cfg, seed=seed)
    traj = Trajectory()
    stats = RunStats()

    for i, frame in enumerate(frames):
        if len(frame) == 3:
            gray, depth, ts = frame
        else:
            gray, depth = frame
            ts = float(i)
        gray = jnp.asarray(gray, jnp.float32)
        depth = jnp.asarray(depth, jnp.float32)

        t0 = time.time()
        state, out = engine.step(state, gray, depth, cam, cfg,
                                 with_planes=with_planes)
        out = jax.block_until_ready(out)
        dt = time.time() - t0

        stats.frame_count += 1
        stats.total_step_s += dt
        if i == 0:
            stats.compile_s = dt
        stats.success_count += int(out.success)
        stats.lost_count += int(out.is_lost)
        traj.append(ts, np.asarray(out.position), np.asarray(out.quat))
        if on_frame is not None:
            on_frame(i, state, out, dt)

    return state, traj, stats


def evaluate_against_ground_truth(traj: Trajectory, gt_positions_mm) -> dict:
    """ATE metrics for a run (north-star metric, SURVEY.md §6)."""
    est = traj.positions_array()
    gt = np.asarray(gt_positions_mm, dtype=np.float64)
    n = min(len(est), len(gt))
    return {
        "ate_rmse_mm": ate_rmse(est[:n], gt[:n], align=True),
        "frames": n,
    }
