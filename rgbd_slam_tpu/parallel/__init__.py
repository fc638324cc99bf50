from . import ba  # noqa: F401
