"""Residual kernels for pose optimization.

Replaces the reference's virtual ``IOptimizationFeature::get_distance`` dispatch
(matches_containers.hpp:152-161 and per-type impls in
src/map_management/map_features/*.cpp) with three batched residual blocks assembled
into one stacked vector.  Jacobians come from ``jax.jacfwd`` over these pure functions
— exact derivatives, replacing the reference's ``Eigen::NumericalDiff``
(levenberg_marquardt_functors.hpp:90-92), a large accuracy+speed win flagged in
SURVEY.md §7.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import CameraIntrinsics, RansacConfig
from ..geometry import inverse_depth as idp
from ..geometry import pinhole, planes, se3
from .features import (PLANE_ALPHA, POINT2D_ALPHA, POINT_ALPHA, MatchedFeatures)

#: residual magnitude assigned to invalid projections (reference uses
#: double::max, point_coordinates.cpp:257; we keep it finite for f32 cost sums)
BIG_RESIDUAL = 1.0e4


def point_residuals(feats: MatchedFeatures, w2c, cam: CameraIntrinsics):
    """Signed 2D px reprojection error per 3D point, [NP, 2]
    (reference: PointOptimizationFeature::get_distance, map_point.cpp:40-45)."""
    d = pinhole.signed_screen_distance_2d(
        feats.point_world, feats.point_obs_uv, w2c, cam, big=BIG_RESIDUAL)
    return jnp.where(feats.point_mask[..., None], d, 0.0)


def point2d_residuals(feats: MatchedFeatures, w2c, cam: CameraIntrinsics):
    """Signed px distance of the observation to the projected inverse-depth segment,
    [N2, 2] (reference: Point2dOptimizationFeature::get_distance,
    map_point2d.cpp:40-46 — rho variance taken from the state std dev)."""
    rho_var = feats.point2d_state_std[..., idp.INVERSE_DEPTH_IDX] ** 2
    d = idp.signed_screen_distance(
        feats.point2d_state, rho_var, feats.point2d_obs_uv, w2c, cam, big=BIG_RESIDUAL)
    return jnp.where(feats.point2d_mask[..., None], d, 0.0)


def plane_residuals(feats: MatchedFeatures, w2c, cam: CameraIntrinsics = None):
    """Reduced ``d*n`` plane error, [NK, 3] (reference:
    PlaneOptimizationFeature::get_distance, map_primitive.cpp:51-62)."""
    plane_w2c = se3.plane_world_to_camera_matrix(w2c)
    d = planes.reduced_signed_distance(feats.plane_world, feats.plane_cam, plane_w2c)
    return jnp.where(feats.plane_mask[..., None], d, 0.0)


def residual_vector(coeffs, feats: MatchedFeatures, cam: CameraIntrinsics,
                    weights=None):
    """Full stacked residual vector for the 6-dof optimization coefficients.

    Per-feature blocks are scaled by ``alpha / part_count`` exactly like the reference
    cost assembly (Global_Pose_Estimator::operator(), levenberg_marquardt_functors.cpp
    :128-169).  ``weights`` (unified index space) selects the RANSAC subset; masked or
    unselected features contribute zero residual."""
    quat, position = se3.coefficients_to_pose(coeffs)
    w2c = se3.world_to_camera(quat, position)

    rp = point_residuals(feats, w2c, cam) * (POINT_ALPHA / 2.0)
    rq = point2d_residuals(feats, w2c, cam) * (POINT2D_ALPHA / 2.0)
    rk = plane_residuals(feats, w2c) * (PLANE_ALPHA / 3.0)

    if weights is not None:
        wp, wq, wk = feats.split_unified(weights)
        rp = rp * wp[..., None]
        rq = rq * wq[..., None]
        rk = rk * wk[..., None]

    return jnp.concatenate(
        [rp.reshape(rp.shape[:-2] + (-1,)),
         rq.reshape(rq.shape[:-2] + (-1,)),
         rk.reshape(rk.shape[:-2] + (-1,))], axis=-1)


def inlier_masks(quat, position, feats: MatchedFeatures, cam: CameraIntrinsics,
                 ransac: RansacConfig = RansacConfig()):
    """Per-type inlier masks at a given pose (reference per-type ``is_inlier``:
    map_point.cpp:34-38 L1 px <= 3; map_point2d.cpp:33-38 per-component <= 3;
    map_primitive.cpp:33-49 4-vector abs <= [0.2,0.2,0.2,50])."""
    w2c = se3.world_to_camera(quat, position)

    d_pt = pinhole.screen_distance_px(
        feats.point_world, feats.point_obs_uv, w2c, cam, big=BIG_RESIDUAL)
    point_in = (d_pt <= ransac.max_retroprojection_error_point_px) & feats.point_mask

    rho_var = feats.point2d_state_std[..., idp.INVERSE_DEPTH_IDX] ** 2
    d_2d = idp.signed_screen_distance(
        feats.point2d_state, rho_var, feats.point2d_obs_uv, w2c, cam, big=BIG_RESIDUAL)
    point2d_in = jnp.all(
        jnp.abs(d_2d) <= ransac.max_retroprojection_error_point2d_px, axis=-1
    ) & feats.point2d_mask

    plane_w2c = se3.plane_world_to_camera_matrix(w2c)
    d_pl = jnp.abs(planes.signed_distance(feats.plane_world, feats.plane_cam, plane_w2c))
    thresholds = jnp.asarray(
        [ransac.max_retroprojection_error_plane_normal] * 3
        + [ransac.max_retroprojection_error_plane_mm], dtype=d_pl.dtype)
    plane_in = jnp.all(d_pl <= thresholds, axis=-1) & feats.plane_mask

    return point_in, point2d_in, plane_in


def random_variation(feats: MatchedFeatures, key) -> MatchedFeatures:
    """Perturb map features by their standard deviation for the Monte-Carlo pose
    covariance (reference per-type ``compute_random_variation``:
    map_point.cpp:48-57 full N(0,std) on the world point;
    map_point2d.cpp:49-74 theta/phi only, clamped to their domains;
    map_primitive.cpp:66-80 normal+d perturbation with renormalization)."""
    import jax

    k1, k2, k3, k4 = jax.random.split(key, 4)
    dt = feats.point_world.dtype

    new_points = feats.point_world + (
        jax.random.normal(k1, feats.point_world.shape, dtype=dt) * feats.point_world_std)

    theta = feats.point2d_state[..., idp.THETA_IDX]
    phi = feats.point2d_state[..., idp.PHI_IDX]
    nt = jnp.clip(
        theta + jax.random.normal(k2, theta.shape, dtype=dt)
        * feats.point2d_state_std[..., idp.THETA_IDX], 0.0, jnp.pi)
    nphi = jnp.clip(
        phi + jax.random.normal(k3, phi.shape, dtype=dt)
        * feats.point2d_state_std[..., idp.PHI_IDX], -jnp.pi, jnp.pi)
    new_state = feats.point2d_state.at[..., idp.THETA_IDX].set(nt)
    new_state = new_state.at[..., idp.PHI_IDX].set(nphi)

    plane_noise = jax.random.normal(k4, feats.plane_world.shape, dtype=dt) \
        * feats.plane_world_std
    new_planes = planes.normalize_plane(feats.plane_world + plane_noise)

    return feats._replace(
        point_world=new_points, point2d_state=new_state, plane_world=new_planes)
