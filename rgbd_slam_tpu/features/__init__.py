from . import primitives  # noqa: F401
