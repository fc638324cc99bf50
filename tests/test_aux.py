"""Aux subsystem tests: checkpoint/resume, stage timing, runner, determinism."""

import numpy as np
import jax
import jax.numpy as jnp

from rgbd_slam_tpu import engine, runner
from rgbd_slam_tpu.config import CameraIntrinsics, EngineConfig, MappingConfig, SlamConfig
from rgbd_slam_tpu.io import checkpoint
from rgbd_slam_tpu.profiling import StageTimer
from rgbd_slam_tpu.synthetic import WallScene, lateral_trajectory
import pytest

CAM = CameraIntrinsics(width=320, height=240, fx=260.0, fy=260.0, cx=160.0, cy=120.0)
CFG = SlamConfig(
    mapping=MappingConfig(max_points_3d=128, max_points_2d=32, max_planes=8,
                          max_tracked_points=64),
    engine=EngineConfig(pose_covariance_mc_iterations=8, lm_iterations=8,
                        ransac_hypothesis_batch=16),
)


def short_sequence(n=3):
    scene = WallScene(CAM)
    return [scene.render(q, p) for q, p in lateral_trajectory(n)]


@pytest.mark.slow
class TestCheckpoint:
    def test_round_trip_bit_exact(self, tmp_path):
        frames = short_sequence(2)
        state = engine.init_state(CAM, CFG)
        for g, d in frames:
            state, _ = engine.step(state, jnp.asarray(g), jnp.asarray(d), CAM, CFG)
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save_state(state, path)
        template = engine.init_state(CAM, CFG)
        loaded = checkpoint.load_state(path, template)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_continues_identically(self, tmp_path):
        frames = short_sequence(4)
        # run all 4 frames straight
        s1 = engine.init_state(CAM, CFG)
        for g, d in frames:
            s1, o1 = engine.step(s1, jnp.asarray(g), jnp.asarray(d), CAM, CFG)
        # run 2, checkpoint, resume, run 2 more
        s2 = engine.init_state(CAM, CFG)
        for g, d in frames[:2]:
            s2, _ = engine.step(s2, jnp.asarray(g), jnp.asarray(d), CAM, CFG)
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save_state(s2, path)
        s3 = checkpoint.load_state(path, engine.init_state(CAM, CFG))
        for g, d in frames[2:]:
            s3, o3 = engine.step(s3, jnp.asarray(g), jnp.asarray(d), CAM, CFG)
        np.testing.assert_allclose(np.asarray(o1.position), np.asarray(o3.position),
                                   atol=1e-5)

    def test_capacity_mismatch_rejected(self, tmp_path):
        state = engine.init_state(CAM, CFG)
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save_state((state.quat, state.position), path)
        try:
            checkpoint.load_state(path, state)
            assert False, "should have raised"
        except ValueError:
            pass


@pytest.mark.slow
class TestDeterminism:
    def test_same_seed_same_trajectory(self):
        frames = short_sequence(3)
        outs = []
        for _ in range(2):
            state = engine.init_state(CAM, CFG, seed=42)
            for g, d in frames:
                state, out = engine.step(state, jnp.asarray(g), jnp.asarray(d),
                                         CAM, CFG)
            outs.append(np.asarray(out.position))
        np.testing.assert_array_equal(outs[0], outs[1])


@pytest.mark.slow
class TestRunner:
    def test_run_frames_produces_trajectory(self):
        frames = short_sequence(3)
        state, traj, stats = runner.run_frames(frames, CAM, CFG)
        assert stats.frame_count == 3
        assert len(traj.positions) == 3
        assert stats.mean_step_ms > 0

    def test_evaluate_against_gt(self):
        scene = WallScene(CAM)
        poses = lateral_trajectory(4)
        frames = [scene.render(q, p) for q, p in poses]
        state, traj, stats = runner.run_frames(frames, CAM, CFG)
        gt = np.stack([p for _, p in poses])
        metrics = runner.evaluate_against_ground_truth(traj, gt)
        assert metrics["frames"] == 4
        assert metrics["ate_rmse_mm"] < 20.0


class TestStageTimer:
    def test_breakdown(self):
        t = StageTimer()
        t.record("extract", 0.010)
        t.record("extract", 0.020)
        t.record("optimize", 0.030)
        report = t.show_statistics(frame_count=2)
        assert "extract" in report and "optimize" in report
        assert "15.00 ms" in report  # mean of extract


@pytest.mark.slow
class TestDebugImage:
    def test_renders_overlays(self):
        from rgbd_slam_tpu.io.debug_image import render_debug_image

        frames = short_sequence(2)
        state = engine.init_state(CAM, CFG)
        for g, d in frames:
            state, out = engine.step(state, jnp.asarray(g), jnp.asarray(d), CAM, CFG)
        img = render_debug_image(frames[-1][0], state, CAM, fps=12.5,
                                 is_lost=False)
        assert img.shape == (240, 320, 3) and img.dtype == np.uint8
        # overlays drew some colored (non-gray) pixels
        colored = (img[..., 0] != img[..., 1]) | (img[..., 1] != img[..., 2])
        assert colored.sum() > 100

    def test_lost_tint(self):
        from rgbd_slam_tpu.io.debug_image import render_debug_image

        frames = short_sequence(1)
        state = engine.init_state(CAM, CFG)
        img_ok = render_debug_image(frames[0][0], state, CAM, is_lost=False)
        img_lost = render_debug_image(frames[0][0], state, CAM, is_lost=True)
        assert img_lost[50:, :, 0].mean() > img_ok[50:, :, 0].mean() + 30


class TestConfigParity:
    """Config fields must be live and derived from the reference's own formulas."""

    def test_no_dead_detection_fields(self):
        """Every config field of every config class is consumed somewhere in the
        package (the round-1 optical_flow_max_error_px regression: a field
        nothing read; the round-3 fast_threshold regression: engine constants
        that stopped reading config).  config.py itself counts as a consumer
        (derived properties), but the field's own definition line does not."""
        import dataclasses
        import pathlib
        import re

        from rgbd_slam_tpu import config as config_mod

        pkg = pathlib.Path(__file__).resolve().parents[1] / "rgbd_slam_tpu"
        parts = []
        for p in pkg.rglob("*.py"):
            text = p.read_text()
            if p.name == "config.py":
                # strip dataclass field-definition lines ("name: type = ...")
                # so a field does not count as its own consumer
                text = "\n".join(
                    ln for ln in text.splitlines()
                    if not re.match(r"\s*\w+\s*:\s*\w+(\s*=|\s*$)", ln))
            parts.append(text)
        src = "\n".join(parts)
        classes = [config_mod.DepthNoiseModel, config_mod.RansacConfig,
                   config_mod.DetectionConfig, config_mod.MatchingConfig,
                   config_mod.MappingConfig, config_mod.EngineConfig]
        for cls in classes:
            for f in dataclasses.fields(cls):
                assert f.name in src, \
                    f"dead config field: {cls.__name__}.{f.name}"

    def test_fast_thresholds_follow_reference_curve(self):
        """Defaults equal the reference's empirical curve 41.2378*0.99945^points at
        10x / 30x maximumPointPerFrame (keypoint_detection.cpp:48-65)."""
        from rgbd_slam_tpu.config import DetectionConfig

        det = DetectionConfig()
        assert det.fast_threshold == det.fast_threshold_curve(
            10.0 * det.max_point_per_frame) == 24
        assert det.fast_threshold_low == det.fast_threshold_curve(
            30.0 * det.max_point_per_frame) == 8

    def test_low_texture_uses_sensitive_tier(self):
        """On a weak-texture image the high tier alone finds almost nothing; the
        two-tier detector still yields points via the sensitive fallback
        (keypoint_detection.cpp:435-452)."""
        import jax.numpy as jnp

        from rgbd_slam_tpu.ops import fast

        rng = np.random.default_rng(3)
        img = jnp.asarray(
            128.0 + 4.0 * rng.standard_normal((240, 320)), jnp.float32)
        det = CFG.detection
        _, _, valid_2tier = fast.detect_fast_grid(
            img, threshold=float(det.fast_threshold),
            low_threshold=float(det.fast_threshold_low), max_points=100)
        _, _, valid_hi_only = fast.detect_fast_grid(
            img, threshold=float(det.fast_threshold),
            low_threshold=float(det.fast_threshold), max_points=100)
        assert int(valid_2tier.sum()) > int(valid_hi_only.sum())
        assert int(valid_2tier.sum()) > 20

    def test_yaml_rotation_offset_parity(self, tmp_path):
        """Non-axis-aligned camera-2 rotation offsets must reproduce the
        reference's quirky euler composition: parameters.cpp:44-48 passes
        (rotX, rotY, rotZ) into EulerAngles(yaw, pitch, roll) (types.hpp:80)
        and angle_utils.cpp:6-12 composes AngleAxis(roll,X) * AngleAxis(pitch,Y)
        * AngleAxis(yaw,Z), so the extrinsic rotation is Rx(rotZ)*Ry(rotY)*Rz(rotX)."""
        from rgbd_slam_tpu.config import load_camera_yaml

        rx, ry, rz = 0.05, -0.02, 0.11
        yaml = tmp_path / "cam.yaml"
        yaml.write_text(
            "camera_1_focal_x: 520.0\n"
            "camera_2_rotation_offset_x: {}\n"
            "camera_2_rotation_offset_y: {}\n"
            "camera_2_rotation_offset_z: {}\n"
            "camera_2_translation_offset_x: 25.0\n".format(rx, ry, rz))
        setup = load_camera_yaml(str(yaml))
        got = np.array(setup.depth_to_rgb)[:3, :3]

        def rot(axis, a):
            c, s = np.cos(a), np.sin(a)
            m = np.eye(3)
            i, j = [(1, 2), (0, 2), (0, 1)][axis]
            m[i, i] = c
            m[j, j] = c
            m[i, j] = -s if axis != 1 else s
            m[j, i] = s if axis != 1 else -s
            return m

        want = rot(0, rz) @ rot(1, ry) @ rot(2, rx)
        np.testing.assert_allclose(got, want, atol=1e-12)
        assert np.array(setup.depth_to_rgb)[0, 3] == 25.0
        assert setup.rgb.fx == 520.0