"""Line / segment distance primitives (batched).

Parity with reference src/utils/line.hpp and src/utils/distance_utils.hpp.  All
functions broadcast over leading axes; branchy reference logic (parallel-line special
cases) becomes masked selection for jit-compatibility.
"""

from __future__ import annotations

import jax.numpy as jnp


def angle_distance(a, b):
    """Wrapped angular difference (reference: distance_utils.cpp:7-10)."""
    return jnp.arctan2(jnp.sin(a - b), jnp.cos(a - b))


def line_signed_distance_to_point(start, direction, point):
    """Signed perpendicular offset of ``point`` from the infinite line through ``start``
    with unit ``direction`` (reference: ILine::distance / get_closest_point_on_line,
    line.hpp:26-41).  Works for 2D and 3D."""
    d = direction / jnp.maximum(jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-12)
    rel = point - start
    along = jnp.sum(rel * d, axis=-1, keepdims=True)
    return rel - along * d


def segment_signed_distance_to_point(p0, p1, point):
    """Signed offset of ``point`` from the infinite line through segment (p0, p1)
    (reference: Segment::distance via compute_normal, line.hpp:77-106 — the reference
    does NOT clamp to the segment extent)."""
    return line_signed_distance_to_point(p0, p1 - p0, point)


def line_line_closest_points(p1, d1, p2, d2, eps=1e-10):
    """Closest points between two 3D lines (reference: compute_closest_points,
    distance_utils.hpp:36-64).  Returns (closest_on_1, closest_on_2, parallel_mask)."""
    n = jnp.cross(d1, d2)
    parallel = jnp.sum(n * n, axis=-1) < eps
    n1 = jnp.cross(d1, n)
    n2 = jnp.cross(d2, n)
    den1 = jnp.sum(d1 * n2, axis=-1)
    den2 = jnp.sum(d2 * n1, axis=-1)
    safe1 = jnp.where(jnp.abs(den1) < eps, 1.0, den1)
    safe2 = jnp.where(jnp.abs(den2) < eps, 1.0, den2)
    t1 = jnp.sum((p2 - p1) * n2, axis=-1) / safe1
    t2 = jnp.sum((p1 - p2) * n1, axis=-1) / safe2
    c1 = p1 + t1[..., None] * d1
    c2 = p2 + t2[..., None] * d2
    return c1, c2, parallel


def signed_line_distance(p1, d1, p2, d2, eps=1e-10):
    """Signed 3-vector distance between two 3D lines; for parallel lines falls back to
    ``d1 x (p1 - p2)`` (reference: signed_line_distance, distance_utils.hpp:66-87)."""
    c1, c2, parallel = line_line_closest_points(p1, d1, p2, d2, eps)
    fallback = jnp.cross(d1, p1 - p2)
    return jnp.where(parallel[..., None], fallback, c1 - c2)
