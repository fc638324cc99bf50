"""6-DoF pose optimization: batched RANSAC + fixed-iteration Levenberg-Marquardt +
Monte-Carlo pose covariance.

TPU-first redesign of reference src/pose_optimization/pose_optimization.cpp:

* the reference's ``tbb::parallel_for`` over sequential RANSAC iterations with an
  atomic early stop (pose_optimization.cpp:154-226) becomes ONE batch of B hypotheses
  optimized in lockstep under ``vmap`` — no data-dependent control flow, every
  hypothesis pays the same fixed LM iteration count;
* Eigen's LM with numerical differentiation (pose_optimization.cpp:334-339) becomes a
  fixed-iteration damped Gauss-Newton with exact ``jax.jacfwd`` Jacobians on the
  6-dof stereographic pose coefficients;
* the Monte-Carlo covariance (<=100 re-optimizations under feature noise,
  pose_optimization.cpp:361-437) becomes one more vmapped LM batch.

Everything in this module is jit-compatible; the only outputs are arrays + masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, EngineConfig, RansacConfig
from ..geometry import se3
from .features import MatchedFeatures
from .residuals import inlier_masks, random_variation, residual_vector


class PoseOptimizationResult(NamedTuple):
    success: jnp.ndarray         # [] bool
    quat: jnp.ndarray            # [4]
    position: jnp.ndarray        # [3]
    covariance: jnp.ndarray      # [6, 6] pose covariance (position + euler xyz)
    point_inliers: jnp.ndarray   # [NP] bool
    point2d_inliers: jnp.ndarray # [N2] bool
    plane_inliers: jnp.ndarray   # [NK] bool
    inlier_score: jnp.ndarray    # [] total inlier score


# ---------------------------------------------------------------------------
# Levenberg-Marquardt core
# ---------------------------------------------------------------------------

def lm_solve(coeffs0, feats: MatchedFeatures, cam: CameraIntrinsics,
             weights=None, iterations: int = 16, damping0: float = 1e-3):
    """Fixed-iteration damped least squares on the 6-dof pose coefficients.

    Classic LM accept/reject schedule expressed as a ``lax.scan``: each iteration
    computes J via jacfwd, solves the damped normal equations, and keeps the step only
    if the cost decreased (damping /2 on accept, x4 on reject).  Returns
    (coeffs, final_cost)."""

    def cost_of(c):
        r = residual_vector(c, feats, cam, weights)
        return jnp.sum(r * r), r

    def step(carry, _):
        coeffs, damping, cost = carry
        jac = jax.jacfwd(lambda c: residual_vector(c, feats, cam, weights))(coeffs)
        r = residual_vector(coeffs, feats, cam, weights)
        jtj = jac.T @ jac
        g = jac.T @ r
        a = jtj + damping * jnp.diag(jnp.maximum(jnp.diagonal(jtj), 1e-8))
        delta = jnp.linalg.solve(a + 1e-12 * jnp.eye(6, dtype=coeffs.dtype), -g)
        new_coeffs = coeffs + delta
        new_cost, _ = cost_of(new_coeffs)
        accept = (new_cost < cost) & jnp.all(jnp.isfinite(new_coeffs))
        coeffs = jnp.where(accept, new_coeffs, coeffs)
        cost = jnp.where(accept, new_cost, cost)
        damping = jnp.where(accept, damping * 0.5, damping * 4.0)
        damping = jnp.clip(damping, 1e-9, 1e6)
        return (coeffs, damping, cost), None

    cost0, _ = cost_of(coeffs0)
    (coeffs, _, cost), _ = jax.lax.scan(
        step, (coeffs0, jnp.asarray(damping0, coeffs0.dtype), cost0), None,
        length=iterations)
    return coeffs, cost


# ---------------------------------------------------------------------------
# RANSAC
# ---------------------------------------------------------------------------

def _draw_subsets(key, scores, valid, batch: int):
    """Draw ``batch`` random subsets over the unified feature index space, each taken
    in random order until the cumulative score reaches 1.0 (reference:
    ransac::get_random_subset_with_score, ransac.hpp:78-131).

    Returns a float weight matrix [batch, F] with 1.0 for selected features."""
    f = scores.shape[-1]
    priorities = jax.random.uniform(key, (batch, f))
    priorities = jnp.where(valid[None, :], priorities, 2.0)  # invalid sort last
    order = jnp.argsort(priorities, axis=-1)
    sorted_scores = jnp.take_along_axis(
        jnp.broadcast_to(scores, (batch, f)), order, axis=-1)
    csum = jnp.cumsum(sorted_scores, axis=-1)
    # take features up to and including the one that crosses score 1.0
    selected_sorted = (csum - sorted_scores) < 1.0
    selected_sorted = selected_sorted & (sorted_scores > 0)
    weights = jnp.zeros((batch, f), dtype=scores.dtype)
    batch_idx = jnp.broadcast_to(jnp.arange(batch)[:, None], (batch, f))
    weights = weights.at[batch_idx, order].set(selected_sorted.astype(scores.dtype))
    return weights


#: compact per-hypothesis subset capacities: any score-1.0 subset fits
#: (5 points x 0.2, 5 2d-points x 0.2, 3 planes x 1/3, or a crossing mix)
_SUBSET_CAPS = (6, 6, 3)


def _compact_subset(feats: MatchedFeatures, sel_unified) -> MatchedFeatures:
    """Gather one hypothesis' selected features into small fixed-capacity blocks so
    the per-hypothesis LM solves a ~30-row system instead of the full map-capacity
    residual stack."""
    np_, n2, nk = feats.capacities
    cp, c2, ck = _SUBSET_CAPS

    def compact_idx(mask, cap):
        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
        dest = jnp.where(mask & (rank < cap), rank, cap)
        idx = jnp.full((cap,), 0, jnp.int32).at[dest].set(
            jnp.arange(mask.shape[0], dtype=jnp.int32), mode="drop")
        cnt = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), cap)
        return idx, jnp.arange(cap) < cnt

    sp, s2, sk = feats.split_unified(sel_unified)
    ip, mp_ = compact_idx(sp, cp)
    i2, m2_ = compact_idx(s2, c2)
    ik, mk_ = compact_idx(sk, ck)

    return MatchedFeatures(
        point_obs_uv=feats.point_obs_uv[ip], point_world=feats.point_world[ip],
        point_world_std=feats.point_world_std[ip], point_mask=mp_,
        point2d_obs_uv=feats.point2d_obs_uv[i2], point2d_state=feats.point2d_state[i2],
        point2d_state_std=feats.point2d_state_std[i2], point2d_mask=m2_,
        plane_cam=feats.plane_cam[ik], plane_world=feats.plane_world[ik],
        plane_world_std=feats.plane_world_std[ik], plane_mask=mk_,
    )


def _score_pose(coeffs, feats, cam, ransac_cfg):
    from .features import PLANE_SCORE, POINT2D_SCORE, POINT_SCORE

    quat, position = se3.coefficients_to_pose(coeffs)
    p_in, q_in, k_in = inlier_masks(quat, position, feats, cam, ransac_cfg)
    score = (POINT_SCORE * jnp.sum(p_in) + POINT2D_SCORE * jnp.sum(q_in)
             + PLANE_SCORE * jnp.sum(k_in))
    count = jnp.sum(p_in) + jnp.sum(q_in) + jnp.sum(k_in)
    return score, count, (p_in, q_in, k_in)


def compute_optimized_pose(key, quat0, position0, feats: MatchedFeatures,
                           cam: CameraIntrinsics,
                           ransac_cfg: RansacConfig = RansacConfig(),
                           engine_cfg: EngineConfig = EngineConfig(),
                           compute_covariance: bool = True) -> PoseOptimizationResult:
    """Full pose estimation (reference: Pose_Optimization::compute_optimized_pose,
    pose_optimization.cpp:264-300): RANSAC over feature subsets, LM refit on the best
    inlier set, Monte-Carlo covariance.  Jit-compatible; failure is reported through
    the ``success`` flag instead of exceptions."""
    dt = position0.dtype
    coeffs0 = se3.pose_to_coefficients(quat0.astype(dt), position0)
    scores = feats.scores()
    valid = feats.valid_mask()
    enough = jnp.sum(scores) >= 1.0  # pose_optimization.cpp:117-124

    b = engine_cfg.ransac_hypothesis_batch
    k_subsets, k_p3p, k_cov = jax.random.split(key, 3)
    weights = _draw_subsets(k_subsets, scores, valid, b)

    # batched LM on each hypothesis subset (replaces pose_optimization.cpp:154-226);
    # each subset is compacted to a ~30-row system before the solve
    hyp_coeffs, _ = jax.vmap(
        lambda w: lm_solve(coeffs0, _compact_subset(feats, w > 0), cam,
                           iterations=engine_cfg.lm_iterations))(weights)

    # closed-form P3P hypotheses from random 3-point minimal subsets
    # (north-star batched P3P-RANSAC; the reference only vendors the solver)
    b3 = getattr(engine_cfg, "p3p_hypothesis_batch", 0)
    if b3 > 0:
        from ..geometry import pinhole
        from ..ops.p3p import p3p

        pri = jax.random.uniform(k_p3p, (b3, feats.point_mask.shape[0]))
        pri = jnp.where(feats.point_mask[None, :], pri, 2.0)
        _, tri_idx = jax.lax.top_k(-pri, 3)                    # [b3, 3]
        tri_world = feats.point_world[tri_idx]                 # [b3, 3, 3]
        tri_uv = feats.point_obs_uv[tri_idx]
        uv1 = jnp.concatenate([tri_uv, jnp.ones_like(tri_uv[..., :1])], axis=-1)
        dirs = pinhole.screen_to_camera(uv1, cam)
        bearings = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        enough_pts = jnp.sum(feats.point_mask) >= 3
        q3, p3, ok3 = p3p(tri_world, bearings)                 # [b3, 4, ...]
        p3p_coeffs = se3.pose_to_coefficients(
            q3.reshape(-1, 4), p3.reshape(-1, 3))
        p3p_ok = ok3.reshape(-1) & enough_pts
        hyp_coeffs = jnp.concatenate([hyp_coeffs, p3p_coeffs], axis=0)
        hyp_ok = jnp.concatenate(
            [jnp.ones((b,), bool), p3p_ok], axis=0)
    else:
        hyp_ok = jnp.ones((b,), bool)

    hyp_scores, hyp_counts = jax.vmap(
        lambda c: _score_pose(c, feats, cam, ransac_cfg)[:2])(hyp_coeffs)
    hyp_scores = jnp.where(hyp_ok, hyp_scores, -1.0)

    # best hypothesis: max score, ties by inlier count
    # (pose_optimization.cpp:205-215)
    rank = hyp_scores + 1e-6 * hyp_counts.astype(dt)
    best = jnp.argmax(rank)
    best_coeffs = hyp_coeffs[best]
    best_score = hyp_scores[best]

    # inliers of the best hypothesis, final refit on them
    # (pose_optimization.cpp:244-254)
    _, _, (p_in, q_in, k_in) = _score_pose(best_coeffs, feats, cam, ransac_cfg)
    inlier_feats = feats.with_masks(p_in, q_in, k_in)
    final_coeffs, _ = lm_solve(best_coeffs, inlier_feats, cam,
                               iterations=engine_cfg.lm_iterations)

    # re-evaluate inliers at the final pose
    final_score, _, (p_in2, q_in2, k_in2) = _score_pose(
        final_coeffs, feats, cam, ransac_cfg)
    success = enough & (best_score >= 1.0) & (final_score >= 1.0) \
        & jnp.all(jnp.isfinite(final_coeffs))

    quat, position = se3.coefficients_to_pose(final_coeffs)
    quat = se3.quat_normalize(quat)

    if compute_covariance:
        inlier_final = feats.with_masks(p_in2, q_in2, k_in2)
        covariance = compute_pose_variance(
            k_cov, final_coeffs, inlier_final, cam,
            iterations=engine_cfg.pose_covariance_mc_iterations,
            lm_iterations=getattr(engine_cfg, "mc_lm_iterations",
                                  engine_cfg.lm_iterations))
    else:
        covariance = jnp.eye(6, dtype=dt) * 1e-3

    return PoseOptimizationResult(
        success=success, quat=quat, position=position, covariance=covariance,
        point_inliers=p_in2, point2d_inliers=q_in2, plane_inliers=k_in2,
        inlier_score=final_score)


# ---------------------------------------------------------------------------
# Monte-Carlo pose covariance
# ---------------------------------------------------------------------------

def _pose_vector(coeffs):
    """Pose 6-vector [position, euler xyz] used for covariance statistics
    (reference: PoseBase::get_vector, pose.hpp:31-37 — position followed by the
    ``eulerAngles(0,1,2)`` factorization R = Rx(a) Ry(b) Rz(c))."""
    quat, position = se3.coefficients_to_pose(coeffs)
    m = se3.quat_to_matrix(quat)
    b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.concatenate([position, jnp.stack([a, b, c], axis=-1)], axis=-1)


def compute_pose_variance(key, coeffs_opt, inlier_feats: MatchedFeatures,
                          cam: CameraIntrinsics, iterations: int = 100,
                          lm_iterations: int = 16):
    """Sample covariance of re-optimized poses under feature noise
    (reference: Pose_Optimization::compute_pose_variance,
    pose_optimization.cpp:361-437): perturb every inlier feature by its std dev,
    re-run LM from the optimized pose, accumulate the 6-vector sample covariance,
    +1e-3 diagonal floor.  All ``iterations`` solves run as one vmapped batch."""
    keys = jax.random.split(key, iterations)

    def one(k):
        var_feats = random_variation(inlier_feats, k)
        c, cost = lm_solve(coeffs_opt, var_feats, cam, iterations=lm_iterations)
        return _pose_vector(c)

    vecs = jax.vmap(one)(keys)  # [iterations, 6]
    mean = jnp.mean(vecs, axis=0, keepdims=True)
    centered = vecs - mean
    cov = (centered.T @ centered) / (iterations - 1)
    cov = cov + 1e-3 * jnp.eye(6, dtype=cov.dtype)
    return cov
