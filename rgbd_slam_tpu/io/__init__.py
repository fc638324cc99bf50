from . import datasets, map_writer, trajectory  # noqa: F401
