"""Decaying constant-velocity motion model.

Parity with reference src/tracking/motion_model.cpp: mean-blended linear velocity,
slerp(0.5)-smoothed angular velocity, optional variance inflation.  State is a small
pytree so the model runs inside the jitted engine step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..geometry import se3


class MotionModelState(NamedTuple):
    last_q: jnp.ndarray        # [4] quaternion wxyz
    last_position: jnp.ndarray # [3]
    linear_velocity: jnp.ndarray   # [3]
    angular_velocity: jnp.ndarray  # [4] quaternion wxyz
    is_set: jnp.ndarray        # [] bool


def reset(dtype=jnp.float32) -> MotionModelState:
    """(reference: Motion_Model::reset, motion_model.cpp:7-16)"""
    return MotionModelState(
        last_q=se3.quat_identity(dtype),
        last_position=jnp.zeros(3, dtype),
        linear_velocity=jnp.zeros(3, dtype),
        angular_velocity=se3.quat_identity(dtype),
        is_set=jnp.asarray(False),
    )


def predict_pose(state: MotionModelState, quat, position):
    """Prediction only, no state update: apply the stored constant-velocity
    estimate to the given pose (the first half of Motion_Model::predict_next_pose,
    motion_model.cpp:29-46).  Identity prediction until the model is set."""
    dt = position.dtype
    pred_position = jnp.where(state.is_set, position + state.linear_velocity,
                              position)
    pred_quat = jnp.where(
        state.is_set,
        se3.quat_normalize(se3.quat_multiply(quat, state.angular_velocity)),
        quat,
    )
    return pred_quat, pred_position


def predict_next_pose(state: MotionModelState, quat, position,
                      should_increase_variance: bool = False):
    """Predict the next pose and update the model (reference:
    Motion_Model::predict_next_pose, motion_model.cpp:29-71).

    Returns (new_state, predicted_quat, predicted_position, pose_var_inflation_66)."""
    dt = position.dtype
    # velocities as if the last pose was set
    new_lin_vel = ((position - state.last_position) + state.linear_velocity) * 0.5
    ang_diff = se3.quat_multiply(quat, se3.quat_conjugate(state.last_q))
    new_ang_vel = se3.quat_slerp(ang_diff, state.angular_velocity, 0.5)

    # first call: no velocities, prediction = current pose
    new_lin_vel = jnp.where(state.is_set, new_lin_vel, jnp.zeros(3, dt))
    new_ang_vel = jnp.where(state.is_set, new_ang_vel, se3.quat_identity(dt))

    pred_position = jnp.where(state.is_set, position + new_lin_vel, position)
    pred_quat = jnp.where(
        state.is_set,
        se3.quat_normalize(se3.quat_multiply(quat, new_ang_vel)),
        quat,
    )

    inflation = jnp.zeros((6, 6), dtype=dt)
    if should_increase_variance:
        std = jnp.asarray([10.0, 10.0, 10.0, 0.1, 0.1, 0.1], dtype=dt)
        inflation = jnp.diag(std * std)

    new_state = MotionModelState(
        last_q=quat,
        last_position=position,
        linear_velocity=new_lin_vel,
        angular_velocity=new_ang_vel,
        is_set=jnp.asarray(True),
    )
    return new_state, pred_quat, pred_position, inflation
