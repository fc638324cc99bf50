from . import polygon  # noqa: F401
