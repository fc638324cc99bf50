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
from rgbd_slam_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()
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

    # donate the state: XLA aliases the input/output map buffers, removing the
    # per-frame state copies the non-donating call pays
    step_d = jax.jit(lambda s, g, d: engine.step(s, g, d, cam, cfg),
                     donate_argnums=(0,))

    state = engine.init_state(cam, cfg)
    # warm up / compile on the first two frames
    for g, d in frames_dev[:2]:
        state, out = step_d(state, g, d)
    jax.block_until_ready(out)

    t0 = time.time()
    n_timed = 0
    for i, (g, d) in enumerate(frames_dev[2:], start=2):
        state, out = step_d(state, g, d)
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
        "ba_iters_per_s": round(bench_ba(), 1),
    }
    print(json.dumps(result))


def bench_ba(k=8, l=4096, c=4, iterations=16):
    """Windowed Schur-BA iterations/s on this chip (north-star BA metric)."""
    from jax.sharding import Mesh

    from rgbd_slam_tpu.geometry import pinhole, se3
    from rgbd_slam_tpu.parallel import ba

    cam = TUM_FR1
    rng = np.random.default_rng(0)
    poses = jnp.tile(se3.pose_to_coefficients(
        jnp.asarray([1.0, 0, 0, 0], jnp.float32), jnp.zeros(3, jnp.float32))[None],
        (k, 1))
    landmarks = jnp.asarray(np.concatenate(
        [rng.uniform(2000, 4000, (l, 1)), rng.uniform(-1500, 1500, (l, 2))], 1),
        jnp.float32)
    obs_kf = jnp.asarray(rng.integers(0, k, (l, c)), jnp.int32)
    w2c = se3.world_to_camera(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                              jnp.zeros(3, jnp.float32))
    scr, ok = pinhole.world_to_screen(landmarks, w2c, cam)
    obs_uv = jnp.broadcast_to(scr[:, None, :2], (l, c, 2)).astype(jnp.float32) \
        + jnp.asarray(rng.normal(0, 0.3, (l, c, 2)), jnp.float32)
    obs_mask = jnp.broadcast_to(ok[:, None], (l, c))

    mesh = Mesh(np.array(jax.devices()[:1]), ("lm",))
    fn = ba.make_sharded_ba(mesh, cam, n_keyframes=k, iterations=iterations)
    out = jax.block_until_ready(fn(poses, landmarks, obs_kf, obs_uv, obs_mask))
    t0 = time.time()
    out = jax.block_until_ready(fn(poses, landmarks, obs_kf, obs_uv, obs_mask))
    return iterations / (time.time() - t0)


if __name__ == "__main__":
    main()
