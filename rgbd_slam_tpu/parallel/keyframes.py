"""Keyframe window management feeding the distributed Schur-complement BA backend.

NEW capability vs the reference (which plans but never implements keyframes/BA,
README.md:152-158; ``update_local_to_global`` is an empty TODO, local_map.hpp:263).
The north star's sequence-parallel layer: keyframes are collected from the engine's
per-frame observation record (StepOutput.point_*), landmark observations are grouped
by feature id across the window, and the window is refined with
:mod:`rgbd_slam_tpu.parallel.ba` — locally or sharded over a device mesh.

Host-side orchestration (ring buffers, id bookkeeping) with device solves — the same
split the reference uses between its C++ containers and Eigen kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..config import CameraIntrinsics
from ..geometry import se3
from . import ba


@dataclass
class KeyframeWindow:
    """Sliding window of keyframes with per-feature-id observations."""

    max_keyframes: int = 8
    max_landmarks: int = 512
    max_obs_per_landmark: int = 8

    poses: list = field(default_factory=list)        # [K] 6-coeff np arrays
    timestamps: list = field(default_factory=list)
    frame_ids: list = field(default_factory=list)    # [K] source frame index
    obs: dict = field(default_factory=dict)          # fid -> list[(kf_idx, uv)]
    landmark_pos: dict = field(default_factory=dict) # fid -> last map position

    def add_keyframe(self, quat, position, output, point_positions, timestamp=0.0,
                     frame_id=None):
        """Record a keyframe from an engine step output.

        point_positions: the map's current world positions aligned with the output's
        per-slot record (state.points.pos)."""
        kf_idx = len(self.poses)
        self.poses.append(np.asarray(
            se3.pose_to_coefficients(jnp.asarray(quat), jnp.asarray(position))))
        self.timestamps.append(float(timestamp))
        self.frame_ids.append(kf_idx if frame_id is None else int(frame_id))

        matched = np.asarray(output.point_matched)
        fids = np.asarray(output.point_fid)
        uvs = np.asarray(output.point_obs_uv)
        pos = np.asarray(point_positions)
        for i in np.nonzero(matched & (fids >= 0))[0]:
            fid = int(fids[i])
            entry = self.obs.setdefault(fid, [])
            if len(entry) < self.max_obs_per_landmark:
                entry.append((kf_idx, uvs[i].copy()))
            self.landmark_pos[fid] = pos[i].copy()

        # slide the window: drop the oldest keyframe beyond capacity
        if len(self.poses) > self.max_keyframes:
            self._drop_oldest()

    def _drop_oldest(self):
        self.poses.pop(0)
        self.timestamps.pop(0)
        self.frame_ids.pop(0)
        new_obs = {}
        for fid, entries in self.obs.items():
            kept = [(k - 1, uv) for k, uv in entries if k > 0]
            if kept:
                new_obs[fid] = kept
        self.obs = new_obs

    @property
    def n_keyframes(self):
        return len(self.poses)

    def build_problem(self):
        """Pack the window into the BA layout: landmarks observed in >= 2 keyframes.

        Returns (poses [K, 6], landmarks [L, 3], obs_kf [L, C], obs_uv [L, C, 2],
        obs_mask [L, C], fids [L]) as jnp arrays, or None if under-constrained."""
        if self.n_keyframes < 2:
            return None
        usable = [(fid, e) for fid, e in self.obs.items() if len(e) >= 2]
        if len(usable) < 8:
            return None
        usable = usable[: self.max_landmarks]
        l = len(usable)
        c = self.max_obs_per_landmark
        obs_kf = np.zeros((l, c), np.int32)
        obs_uv = np.zeros((l, c, 2), np.float32)
        obs_mask = np.zeros((l, c), bool)
        landmarks = np.zeros((l, 3), np.float32)
        fids = np.zeros((l,), np.int64)
        for i, (fid, entries) in enumerate(usable):
            fids[i] = fid
            landmarks[i] = self.landmark_pos[fid]
            for j, (k, uv) in enumerate(entries[:c]):
                obs_kf[i, j] = k
                obs_uv[i, j] = uv
                obs_mask[i, j] = True
        return (jnp.asarray(np.stack(self.poses).astype(np.float32)),
                jnp.asarray(landmarks), jnp.asarray(obs_kf),
                jnp.asarray(obs_uv), jnp.asarray(obs_mask), fids)

    def refine(self, cam: CameraIntrinsics, iterations: int = 8, mesh=None):
        """Run windowed BA; returns (refined poses [(quat, position)], refined
        landmark dict fid->pos, costs) or None when under-constrained."""
        problem = self.build_problem()
        if problem is None:
            return None
        poses, landmarks, obs_kf, obs_uv, obs_mask, fids = problem
        if mesh is not None:
            fn = ba.make_sharded_ba(mesh, cam, n_keyframes=poses.shape[0],
                                    iterations=iterations)
            new_poses, new_lm, costs = fn(poses, landmarks, obs_kf, obs_uv,
                                          obs_mask)
        else:
            new_poses, new_lm, costs = ba.ba_solve(
                poses, landmarks, obs_kf, obs_uv, obs_mask, cam,
                iterations=iterations)

        refined = []
        for i in range(new_poses.shape[0]):
            quat, pos = se3.coefficients_to_pose(new_poses[i])
            refined.append((np.asarray(quat), np.asarray(pos)))
        lm_out = {int(fids[i]): np.asarray(new_lm[i])
                  for i in range(new_lm.shape[0])}
        return refined, lm_out, np.asarray(costs)

    def apply_refinement(self, refined, lm_out):
        """Write refined poses/landmarks back into the window so the next refine
        starts from the improved estimate (the live-pipeline feedback path the
        reference leaves as an empty TODO, local_map.hpp:263-266)."""
        new_poses = []
        for quat, pos in refined:
            new_poses.append(np.asarray(se3.pose_to_coefficients(
                jnp.asarray(quat, jnp.float32), jnp.asarray(pos, jnp.float32))))
        self.poses = new_poses
        for fid, pos in lm_out.items():
            if fid in self.landmark_pos:
                self.landmark_pos[fid] = np.asarray(pos)
