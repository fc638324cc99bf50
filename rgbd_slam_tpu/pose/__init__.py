from . import features, optimizer, residuals  # noqa: F401
