"""SE(3) / quaternion math for the SLAM engine.

Conventions (parity with the reference, see docstrings):

* Quaternions are ``[w, x, y, z]`` arrays, Hamilton convention, unit norm.
* The *camera* frame is x-right / y-down / z-forward; the *world* frame is
  x-forward / y-left / z-up.  The fixed change of basis between them is the
  ``AXIS_CORRECTION`` rotation (reference: src/utils/camera_transformation.cpp:7-13,
  built from euler (yaw=0, pitch=90deg, roll=-90deg)).
* ``camera_to_world(q, p) = AXIS_CORRECTION_44 @ [R(q) | p]`` exactly like
  ``compute_camera_to_world_transform`` (camera_transformation.cpp:15-19).
* The 6-dof pose optimization coefficients are position + the stereographic /
  modified-Rodrigues projection of the quaternion (Terzakis et al.; reference:
  src/pose_optimization/levenberg_marquardt_functors.cpp:14-72).

All functions are pure, dtype-polymorphic and batch-friendly (leading axes broadcast),
so ``jax.vmap`` / ``jax.jit`` compose freely — this replaces the reference's per-object
Eigen calls with batched array math.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Rotation taking camera-frame vectors to world-frame vectors:
# cam z (forward) -> world x, cam x (right) -> world -y, cam y (down) -> world -z.
AXIS_CORRECTION = np.array(
    [[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]
)

_AXIS_CORRECTION_44 = np.eye(4)
_AXIS_CORRECTION_44[:3, :3] = AXIS_CORRECTION


# ---------------------------------------------------------------------------
# quaternion primitives
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_multiply(a, b):
    """Hamilton product a*b, [w,x,y,z] layout; broadcasts over leading axes."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q (without building the matrix)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    """Unit quaternion [w,x,y,z] -> 3x3 rotation matrix (batched)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """3x3 rotation matrix -> unit quaternion [w,x,y,z] (batched, branch-free).

    Uses the 4-candidate construction evaluated simultaneously and picks the best
    conditioned one with ``argmax`` — data-dependent branching is replaced by masked
    selection, as jit requires.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # four squared-magnitude candidates (4w^2, 4x^2, 4y^2, 4z^2)
    qs = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    case = jnp.argmax(qs, axis=-1)

    def build(i):
        s = jnp.sqrt(jnp.maximum(qs[..., i], 1e-12)) * 2.0
        if i == 0:
            return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], axis=-1)
        if i == 1:
            return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], axis=-1)
        if i == 2:
            return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], axis=-1)
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], axis=-1)

    cands = jnp.stack([build(i) for i in range(4)], axis=-2)
    q = jnp.take_along_axis(cands, case[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_from_axis_angle(axis, angle):
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = angle / 2.0
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


def quat_from_euler(yaw, pitch, roll):
    """Euler -> quaternion with the reference's convention
    ``Rx(roll) * Ry(pitch) * Rz(yaw)`` (src/utils/angle_utils.cpp:6-12)."""
    yaw, pitch, roll = jnp.asarray(yaw), jnp.asarray(pitch), jnp.asarray(roll)
    dt = jnp.result_type(yaw, pitch, roll, jnp.float32)
    ex = jnp.stack([jnp.cos(roll / 2), jnp.sin(roll / 2), jnp.zeros_like(roll), jnp.zeros_like(roll)], axis=-1).astype(dt)
    ey = jnp.stack([jnp.cos(pitch / 2), jnp.zeros_like(pitch), jnp.sin(pitch / 2), jnp.zeros_like(pitch)], axis=-1).astype(dt)
    ez = jnp.stack([jnp.cos(yaw / 2), jnp.zeros_like(yaw), jnp.zeros_like(yaw), jnp.sin(yaw / 2)], axis=-1).astype(dt)
    return quat_multiply(quat_multiply(ex, ey), ez)


def quat_slerp(a, b, t):
    """Spherical interpolation (used by the motion model, src/utils/motion_model.cpp)."""
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0, -b, b)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-6
    wa = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    wb = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return quat_normalize(wa * a + wb * b)


def quat_angle_distance(a, b):
    """Absolute rotation angle between two unit quaternions, radians."""
    dot = jnp.clip(jnp.abs(jnp.sum(a * b, axis=-1)), 0.0, 1.0)
    return 2.0 * jnp.arccos(dot)


# ---------------------------------------------------------------------------
# rigid transforms (4x4), with the fixed optical->physical axis correction
# ---------------------------------------------------------------------------

def make_transform(rotation_33, translation):
    """[R | t] as a 4x4 homogeneous matrix (batched)."""
    batch = jnp.broadcast_shapes(rotation_33.shape[:-2], translation.shape[:-1])
    dt = jnp.result_type(rotation_33, translation)
    m = jnp.zeros(batch + (4, 4), dtype=dt)
    m = m.at[..., :3, :3].set(rotation_33)
    m = m.at[..., :3, 3].set(translation)
    m = m.at[..., 3, 3].set(1.0)
    return m


def invert_transform(m):
    """Fast inverse of a rigid 4x4 transform."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    return make_transform(rt, -jnp.einsum("...ij,...j->...i", rt, t))


def camera_to_world(quat, position):
    """Pose (quat, position) -> camera->world 4x4 including the axis correction
    (reference: compute_camera_to_world_transform, camera_transformation.cpp:15-19)."""
    base = make_transform(quat_to_matrix(quat), position)
    corr = jnp.asarray(_AXIS_CORRECTION_44, dtype=base.dtype)
    return corr @ base


def world_to_camera(quat, position):
    """Pose -> world->camera 4x4 (reference: camera_transformation.cpp:34-44)."""
    return invert_transform(camera_to_world(quat, position))


def camera_to_world_no_correction(quat, position):
    """Test-only variant without the axis correction
    (reference: camera_transformation.cpp:27-31)."""
    return make_transform(quat_to_matrix(quat), position)


def world_to_camera_no_correction(quat, position):
    return invert_transform(camera_to_world_no_correction(quat, position))


def plane_camera_to_world_matrix(c2w):
    """4x4 transform acting on hessian plane vectors [n, d]
    (reference: compute_plane_camera_to_world_matrix, camera_transformation.cpp:53-62):
    ``[[R, 0], [-t^T R, 1]]``."""
    r = c2w[..., :3, :3]
    t = c2w[..., :3, 3]
    dt = c2w.dtype
    m = jnp.zeros(c2w.shape[:-2] + (4, 4), dtype=dt)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., 3, :3].set(-jnp.einsum("...i,...ij->...j", t, r))
    m = m.at[..., 3, 3].set(1.0)
    return m


def plane_world_to_camera_matrix(w2c):
    """Inverse plane transform (reference: camera_transformation.cpp:64-72).

    Closed form: the plane-vector transform of a homogeneous M is the cofactor
    matrix f(M) = (M^-1)^T, and f(M)^-1 = f(M^-1) — so the world->camera plane
    matrix is just the same construction applied to w2c (no 4x4 inversion; this
    sits inside the LM residual hot loop)."""
    return plane_camera_to_world_matrix(w2c)


# ---------------------------------------------------------------------------
# pose <-> optimization coefficients (stereographic quaternion projection)
# ---------------------------------------------------------------------------

def quat_to_stereographic(q):
    """Unit quaternion -> 3 coefficients (Terzakis et al. stereographic projection;
    reference: levenberg_marquardt_functors.cpp:14-28).  Layout in: [w,x,y,z]."""
    divider = 1.0 / jnp.maximum(1.0 + q[..., 3], 1e-3)
    return jnp.stack([q[..., 0] * divider, q[..., 1] * divider, q[..., 2] * divider], axis=-1)


def stereographic_to_quat(c):
    """3 coefficients -> unit quaternion [w,x,y,z]
    (reference: levenberg_marquardt_functors.cpp:30-41)."""
    alpha = jnp.sum(c * c, axis=-1)
    divider = 1.0 / (alpha + 1.0)
    return jnp.stack(
        [
            2.0 * c[..., 0] * divider,
            2.0 * c[..., 1] * divider,
            2.0 * c[..., 2] * divider,
            (1.0 - alpha) * divider,
        ],
        axis=-1,
    )


def pose_to_coefficients(quat, position):
    """Pose -> 6-vector [position, stereographic(quat)]
    (reference: levenberg_marquardt_functors.cpp:74-81)."""
    return jnp.concatenate([position, quat_to_stereographic(quat)], axis=-1)


def coefficients_to_pose(coeffs):
    """6-vector -> (quat, position) (reference: levenberg_marquardt_functors.cpp:83-88)."""
    return stereographic_to_quat(coeffs[..., 3:]), coeffs[..., :3]


# ---------------------------------------------------------------------------
# pose error metrics (reference: src/utils/pose.cpp)
# ---------------------------------------------------------------------------

def position_error(p_a, p_b):
    return jnp.linalg.norm(p_a - p_b, axis=-1)


def rotation_error_deg(q_a, q_b):
    return jnp.degrees(quat_angle_distance(q_a, q_b))
