"""Montiel-style inverse-depth point parametrization with analytic Jacobians.

State layout (parity with reference src/coordinates/inverse_depth_coordinates.{hpp,cpp}):
``[x0, y0, z0, rho, theta, phi]`` — the world position of the first observation, the
inverse depth (1/mm) along the bearing, and the bearing's spherical angles (theta polar
from +z, phi azimuth), all in the world frame.

Batched over leading axes; used by the 2D-point feature map and the pose optimizer.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import CameraIntrinsics
from . import basis, lines, pinhole

FIRST_POSE_IDX = 0
INVERSE_DEPTH_IDX = 3
THETA_IDX = 4
PHI_IDX = 5


def bearing_vector(state):
    """Unit bearing from (theta, phi) (reference: _bearingVector member,
    inverse_depth_coordinates.hpp:110-131)."""
    theta, phi = state[..., THETA_IDX], state[..., PHI_IDX]
    ones = jnp.ones_like(theta)
    return basis.spherical_to_cartesian(jnp.stack([ones, theta, phi], axis=-1))


def from_cartesian(point_world, origin_world):
    """World point + observation origin -> 6-dof inverse-depth state
    (reference: InverseDepthWorldPoint::from_cartesian,
    inverse_depth_coordinates.cpp:69-77)."""
    v = point_world - origin_world
    sph = basis.cartesian_to_spherical(v)
    rho = 1.0 / jnp.maximum(sph[..., 0], 1e-12)
    origin_b = jnp.broadcast_to(origin_world, v.shape)
    return jnp.concatenate(
        [origin_b, rho[..., None], sph[..., 1:2], sph[..., 2:3]], axis=-1
    )


def from_cartesian_jacobian(point_world, origin_world):
    """6x3 Jacobian of the state w.r.t. the observed world point
    (reference: inverse_depth_coordinates.cpp:79-104)."""
    v = point_world - origin_world
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    t1 = jnp.maximum(x * x + y * y, 1e-12)
    t5 = t1 + z * z
    t4 = 1.0 / t5 ** 1.5
    inv_t1 = 1.0 / t1
    sqrt_t1 = jnp.sqrt(t1)
    inv_t1_t5 = 1.0 / (sqrt_t1 * t5)
    zero = jnp.zeros_like(x)
    jac_low = jnp.stack(
        [
            jnp.stack([-x * t4, -y * t4, -z * t4], axis=-1),
            jnp.stack([x * z * inv_t1_t5, y * z * inv_t1_t5, -sqrt_t1 / t5], axis=-1),
            jnp.stack([-y * inv_t1, x * inv_t1, zero], axis=-1),
        ],
        axis=-2,
    )
    top = jnp.zeros(v.shape[:-1] + (3, 3), dtype=v.dtype)
    return jnp.concatenate([top, jac_low], axis=-2)


def to_world(state):
    """State -> cartesian world point: ``origin + bearing / rho``
    (reference: to_world_coordinates, inverse_depth_coordinates.cpp:106-110)."""
    rho = jnp.maximum(state[..., INVERSE_DEPTH_IDX : INVERSE_DEPTH_IDX + 1], 1e-12)
    return state[..., :3] + bearing_vector(state) / rho


def to_world_jacobian(state):
    """3x6 Jacobian of the cartesian point w.r.t. the state
    (reference: inverse_depth_coordinates.cpp:112-140)."""
    rho = jnp.maximum(state[..., INVERSE_DEPTH_IDX], 1e-12)
    theta, phi = state[..., THETA_IDX], state[..., PHI_IDX]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    d = 1.0 / rho
    d_sqr = 1.0 / (rho * rho)
    t1 = sp * st
    t2 = cp * st
    ct_over_d = ct * d
    zero = jnp.zeros_like(rho)
    reduced = jnp.stack(
        [
            jnp.stack([-t2 * d_sqr, cp * ct_over_d, -t1 * d], axis=-1),
            jnp.stack([-t1 * d_sqr, sp * ct_over_d, t2 * d], axis=-1),
            jnp.stack([-ct * d_sqr, -st * d, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(
        jnp.eye(3, dtype=state.dtype), state.shape[:-1] + (3, 3)
    )
    return jnp.concatenate([eye, reduced], axis=-1)


def from_screen_observation(screen_uv, c2w, cam: CameraIntrinsics,
                            baseline_rho: float = 0.5e-3):
    """Depth-less screen observation -> inverse-depth state with rho set to half the
    inverse-depth baseline (reference: InverseDepthWorldPoint(ScreenCoordinate2D,...)
    ctor, inverse_depth_coordinates.cpp:34-46; baseline parameters.hpp:69-70)."""
    uv1 = jnp.stack(
        [screen_uv[..., 0], screen_uv[..., 1], jnp.ones_like(screen_uv[..., 0])],
        axis=-1,
    )
    cam_dir = pinhole.screen_to_camera(uv1, cam)  # direction, depth=1
    world_pt = pinhole.camera_to_world_point(cam_dir, c2w)
    origin = c2w[..., :3, 3]
    state = from_cartesian(world_pt, origin)
    return state.at[..., INVERSE_DEPTH_IDX].set(baseline_rho)


def estimation_bounds(state, rho_std):
    """Furthest/closest cartesian estimates at +-3 sigma of rho (reference:
    get_furthest_estimation / get_closest_estimation,
    inverse_depth_coordinates.cpp:142-154 — the reference's ``std::min(.., 1e-9)``
    clamp is a sign slip; we clamp from below with max, which is the evident intent)."""
    b = bearing_vector(state)
    rho = state[..., INVERSE_DEPTH_IDX : INVERSE_DEPTH_IDX + 1]
    var3 = 3.0 * rho_std[..., None] if rho_std.ndim == rho.ndim - 1 else 3.0 * rho_std
    far = state[..., :3] + b / jnp.maximum(rho - var3, 1e-9)
    near = state[..., :3] + b / jnp.maximum(rho + var3, 1e-9)
    return far, near


def to_screen_segment(state, rho_variance, w2c, cam: CameraIntrinsics):
    """Project the +-3 sigma inverse-depth span to a screen segment
    (reference: to_screen_coordinates(Segment<2>), inverse_depth_coordinates.cpp:156-175).
    Returns (p0_uv, p1_uv, valid)."""
    rho_std = jnp.sqrt(jnp.maximum(rho_variance, 0.0))
    far, near = estimation_bounds(state, rho_std)
    s0, v0 = pinhole.world_to_screen(far, w2c, cam)
    s1, v1 = pinhole.world_to_screen(near, w2c, cam)
    return s0[..., :2], s1[..., :2], v0 & v1


def signed_screen_distance(state, rho_variance, obs_uv, w2c, cam: CameraIntrinsics,
                           big=1e10):
    """Signed px distance of an observation to the projected inverse-depth segment line
    (reference: compute_signed_screen_distance, inverse_depth_coordinates.cpp:58-67).
    Degenerate (near-zero-length) segments fall back to the point distance so the
    residual stays informative, and invalid projections map to ``big``."""
    p0, p1, valid = to_screen_segment(state, rho_variance, w2c, cam)
    seg_len_sq = jnp.sum((p1 - p0) ** 2, axis=-1)
    line_d = lines.segment_signed_distance_to_point(p0, p1, obs_uv)
    point_d = obs_uv - p0
    d = jnp.where((seg_len_sq < 1e-12)[..., None], point_d, line_d)
    return jnp.where(valid[..., None], d, big)


def signed_line_distance_to_observation(state, obs_uv, w2c, cam: CameraIntrinsics):
    """3D line-to-line signed distance between this feature's bearing ray and the ray of
    a new observation (reference: compute_signed_distance(ScreenCoordinate2D),
    inverse_depth_coordinates.cpp:47-56)."""
    c2w = jnp.linalg.inv(w2c)
    other = from_screen_observation(obs_uv, c2w, cam)
    return lines.signed_line_distance(
        state[..., :3], bearing_vector(state), other[..., :3], bearing_vector(other)
    )
