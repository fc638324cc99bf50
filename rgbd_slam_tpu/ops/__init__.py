from . import brief, depth_cloud, fast, image, matching, optical_flow  # noqa: F401
