from . import basis, covariances, inverse_depth, lines, pinhole, planes, se3  # noqa: F401
