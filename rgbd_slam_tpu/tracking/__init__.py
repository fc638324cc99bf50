from . import inverse_depth_tracking, kalman, motion_model  # noqa: F401
