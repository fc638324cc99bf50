from . import maps  # noqa: F401
