from . import polygon  # noqa: F401
from . import logging  # noqa: F401
