"""Batched inverse-depth point state estimation.

Parity with reference src/tracking/inverse_depth_with_tracking.cpp: the 6-param
inverse-depth state is fused *in cartesian space* through a 3x3 Kalman filter and
re-projected back to inverse-depth form with analytic Jacobians.  All functions are
batched over a leading feature axis.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..config import CameraIntrinsics, DetectionConfig
from ..geometry import covariances as cov_mod
from ..geometry import inverse_depth as idp
from ..geometry import pinhole
from .kalman import kalman_step

#: process noise of the cartesian fusion filter
#: (reference: inverse_depth_with_tracking.cpp:246-260)
INVERSE_DEPTH_PROCESS_NOISE = 1e-4


def initial_covariance(pose_cov33, det: DetectionConfig = DetectionConfig(),
                       dtype=jnp.float32):
    """Covariance of a brand-new inverse-depth observation: pose covariance on the
    origin block, (baseline/4)^2 on rho, (0.5 deg)^2 on the angles
    (reference: PointInverseDepth ctor, inverse_depth_with_tracking.cpp:23-50)."""
    batch = pose_cov33.shape[:-2]
    ang_var = (det.inverse_depth_angle_baseline_d * math.pi / 180.0) ** 2
    # single block update + one broadcasted diagonal add (three scalar .at[]
    # sets on a [N, 6, 6] batch each cost a full dynamic-update-slice)
    diag = jnp.asarray([0.0, 0.0, 0.0,
                        (det.inverse_depth_baseline / 4.0) ** 2,
                        ang_var, ang_var], dtype)
    cov = jnp.zeros(batch + (6, 6), dtype=dtype)
    cov = cov.at[..., :3, :3].set(pose_cov33.astype(dtype))
    return cov + diag * jnp.eye(6, dtype=dtype)


def cartesian_covariance(state, cov66):
    """World-space 3x3 covariance of the cartesian projection of the state
    (reference: compute_cartesian_covariance, inverse_depth_with_tracking.cpp:185-207)."""
    j = idp.to_world_jacobian(state)  # [..., 3, 6]
    return cov_mod.propagate_covariance(cov66, j)


def inverse_depth_covariance_from_cartesian(point_cov33, first_pose_cov33, from_cart_jac):
    """Cartesian 3x3 covariance -> 6x6 inverse-depth covariance, overwriting the origin
    block with the stored first-pose covariance
    (reference: compute_inverse_depth_covariance,
    inverse_depth_with_tracking.cpp:209-229)."""
    cov = cov_mod.propagate_covariance(point_cov33, from_cart_jac)
    return cov.at[..., :3, :3].set(first_pose_cov33)


def fuse_cartesian(state, cov66, obs_world, obs_cov33,
                   process_noise: float = INVERSE_DEPTH_PROCESS_NOISE):
    """Fuse a cartesian world observation into the inverse-depth state
    (reference: update_with_cartesian, inverse_depth_with_tracking.cpp:112-167).

    Returns (new_state, new_cov66, is_moving)."""
    cart = idp.to_world(state)
    cart_cov = cartesian_covariance(state, cov66)
    pn = process_noise * jnp.eye(3, dtype=state.dtype)
    new_cart, new_cart_cov = kalman_step(cart, cart_cov, obs_world, obs_cov33,
                                         process_noise=pn)
    obs_sigma = jnp.sqrt(jnp.abs(jnp.diagonal(obs_cov33, axis1=-2, axis2=-1)))
    is_moving = jnp.any(jnp.abs(cart - obs_world) > obs_sigma, axis=-1)

    origin = state[..., :3]
    new_state = idp.from_cartesian(new_cart, origin)
    jac = idp.from_cartesian_jacobian(new_cart, origin)
    new_cov = inverse_depth_covariance_from_cartesian(
        new_cart_cov, cov66[..., :3, :3], jac
    )
    return new_state, new_cov, is_moving


def fuse_screen_observation_2d(state, cov66, obs_uv, c2w, pose_cov33,
                               cam: CameraIntrinsics,
                               det: DetectionConfig = DetectionConfig()):
    """Fuse a depth-less 2D observation: build a new inverse-depth observation from the
    ray and fuse its cartesian projection (reference: track(ScreenCoordinate2D),
    inverse_depth_with_tracking.cpp:61-82)."""
    obs_state = idp.from_screen_observation(obs_uv, c2w, cam,
                                            baseline_rho=det.inverse_depth_baseline / 2.0)
    obs_cov66 = initial_covariance(pose_cov33, det, dtype=state.dtype)
    obs_world = idp.to_world(obs_state)
    obs_cov33 = cartesian_covariance(obs_state, obs_cov66)
    return fuse_cartesian(state, cov66, obs_world, obs_cov33)


def fuse_screen_observation_3d(state, cov66, obs_screen, c2w, pose_cov33,
                               cam: CameraIntrinsics):
    """Fuse a depth-valid screen observation (reference: track(ScreenCoordinate),
    inverse_depth_with_tracking.cpp:84-110)."""
    obs_world = pinhole.screen_to_world(obs_screen, c2w, cam)
    obs_cov33 = cov_mod.screen_point_to_world_covariance(obs_screen, c2w, cam, pose_cov33)
    return fuse_cartesian(state, cov66, obs_world, obs_cov33)


def linearity_score(state, cov66, c2w):
    """Civera-style linearity index gating the 2D->3D upgrade
    (reference: compute_linearity_score, inverse_depth_with_tracking.cpp:231-244).
    Below ~0.1 the cartesian approximation is accurate enough to promote."""
    cart = idp.to_world(state)
    hc = cart - c2w[..., :3, 3]
    hc_norm = jnp.maximum(jnp.linalg.norm(hc, axis=-1), 1e-9)
    cos_alpha = jnp.sum(idp.bearing_vector(state) * hc, axis=-1) / hc_norm
    rho = jnp.maximum(state[..., idp.INVERSE_DEPTH_IDX], 1e-12)
    rho_var = jnp.abs(cov66[..., idp.INVERSE_DEPTH_IDX, idp.INVERSE_DEPTH_IDX])
    thetad_m = (jnp.sqrt(rho_var) / (rho * rho)) / 1000.0
    d1_m = hc_norm / 1000.0
    return 4.0 * thetad_m / d1_m * jnp.abs(cos_alpha)
