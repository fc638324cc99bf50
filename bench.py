#!/usr/bin/env python
"""Benchmark: frames/s/chip of the full SLAM engine (extract + pose + map update).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the reference claims 200-400 FPS end-to-end on CPU at 640x480
(BASELINE.md; README.md:16) — vs_baseline is measured FPS / 400 (the north-star
frames/s/chip target, BASELINE.json).

The bench renders a synthetic 640x480 block-textured sequence (no public dataset is
available in this environment) and times steady-state jitted engine steps on the
available accelerator, excluding the first-call compile.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import rgbd_slam_tpu  # noqa: E402, F401
from rgbd_slam_tpu import engine  # noqa: E402
from rgbd_slam_tpu.config import TUM_FR1, SlamConfig  # noqa: E402
from rgbd_slam_tpu.synthetic import WallScene, lateral_trajectory  # noqa: E402


def main():
    cam, cfg = TUM_FR1, SlamConfig()
    n_frames = 20
    scene = WallScene(cam)
    poses = lateral_trajectory(n_frames, speed_mm=4.0)
    frames = [scene.render(q, p) for q, p in poses]
    frames_dev = [(jax.device_put(jnp.asarray(g)), jax.device_put(jnp.asarray(d)))
                  for g, d in frames]

    state = engine.init_state(cam, cfg)
    # warm up / compile on the first two frames
    for g, d in frames_dev[:2]:
        state, out = engine.step(state, g, d, cam, cfg)
    jax.block_until_ready(out)

    t0 = time.time()
    n_timed = 0
    errs = []
    for i, (g, d) in enumerate(frames_dev[2:], start=2):
        state, out = engine.step(state, g, d, cam, cfg)
        n_timed += 1
    out = jax.block_until_ready(out)
    elapsed = time.time() - t0

    fps = n_timed / elapsed
    err = float(jnp.linalg.norm(out.position - jnp.asarray(poses[-1][1])))
    result = {
        "metric": "frames_per_second_per_chip",
        "value": round(fps, 2),
        "unit": "fps@640x480",
        "vs_baseline": round(fps / 400.0, 4),
        "final_pose_error_mm": round(err, 2),
        "tracking_success": bool(out.success),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
