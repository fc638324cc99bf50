"""Line segment detector tests on synthetic imagery (the reference has none — LSD is
compiled out of its main loop; this is capability parity with upstream's planned
point/line design, reference README.md:134-136)."""

import numpy as np
import jax.numpy as jnp

from rgbd_slam_tpu.features import lines


def draw_line(img, p0, p1, value=200.0, width=2):
    n = int(np.hypot(p1[0] - p0[0], p1[1] - p0[1])) * 2
    ts = np.linspace(0, 1, max(n, 2))
    for t in ts:
        x = p0[0] + t * (p1[0] - p0[0])
        y = p0[1] + t * (p1[1] - p0[1])
        xi, yi = int(round(x)), int(round(y))
        img[max(yi - width // 2, 0): yi + width // 2 + 1,
            max(xi - width // 2, 0): xi + width // 2 + 1] = value
    return img


def seg_endpoint_error(det_p0, det_p1, gt_p0, gt_p1):
    d1 = np.linalg.norm(det_p0 - gt_p0) + np.linalg.norm(det_p1 - gt_p1)
    d2 = np.linalg.norm(det_p0 - gt_p1) + np.linalg.norm(det_p1 - gt_p0)
    return min(d1, d2) / 2


class TestLineDetection:
    def test_horizontal_line(self):
        img = np.full((240, 320), 50.0, np.float32)
        draw_line(img, (40, 120), (280, 120))
        det = lines.detect_lines(jnp.asarray(img))
        v = np.asarray(det.valid)
        assert v.sum() >= 1
        i = int(np.argmax(np.asarray(det.strength)))
        d = np.abs(np.asarray(det.direction[i]))
        assert d[0] > 0.98, f"direction {d}"
        err = seg_endpoint_error(np.asarray(det.p0[i]), np.asarray(det.p1[i]),
                                 np.array([40, 120]), np.array([280, 120]))
        assert err < 25, f"endpoint error {err}"

    def test_diagonal_line(self):
        img = np.full((240, 320), 50.0, np.float32)
        draw_line(img, (50, 50), (250, 200))
        det = lines.detect_lines(jnp.asarray(img))
        assert int(det.valid.sum()) >= 1
        i = int(np.argmax(np.asarray(det.strength)))
        d = np.asarray(det.direction[i])
        gt_dir = np.array([200.0, 150.0])
        gt_dir /= np.linalg.norm(gt_dir)
        assert abs(abs(d @ gt_dir)) > 0.98

    def test_two_lines(self):
        img = np.full((240, 320), 50.0, np.float32)
        draw_line(img, (30, 60), (290, 60))
        draw_line(img, (160, 20), (160, 220))
        det = lines.detect_lines(jnp.asarray(img))
        assert int(det.valid.sum()) >= 2
        dirs = np.abs(np.asarray(det.direction)[np.asarray(det.valid)])
        has_h = (dirs[:, 0] > 0.95).any()
        has_v = (dirs[:, 1] > 0.95).any()
        assert has_h and has_v

    def test_flat_image_no_lines(self):
        img = np.full((240, 320), 100.0, np.float32)
        det = lines.detect_lines(jnp.asarray(img))
        assert int(det.valid.sum()) == 0

    def test_noise_no_lines(self, rng):
        img = rng.uniform(0, 255, (240, 320)).astype(np.float32)
        det = lines.detect_lines(jnp.asarray(img))
        # pure noise has no coherent orientation tiles
        assert int(det.valid.sum()) <= 2
