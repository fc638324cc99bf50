"""Fixed-capacity convex polygon operations on device.

The reference uses Boost.Geometry concave polygons (src/utils/polygon.{hpp,cpp}) whose
boolean ops have no array-native analogue; per SURVEY.md §7 we use convex polygons with
a fixed vertex capacity: vertices live in a plane-local 2D basis (center + x/y axes),
ops are masked and jittable, and the IoU gate / union-merge of the plane map
(map_primitive.cpp:91-161, plane_with_tracking.cpp:16-79) run batched on device.

Polygon representation: (verts [V, 2], count []) — verts beyond ``count`` are ignored;
a valid polygon is convex and counter-clockwise ordered.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_VERTS = 32


def plane_basis(normal):
    """Orthonormal (u, v) basis of the plane with the given unit normal
    (reference: utils::Polygon plane-local basis, polygon.hpp:121-150)."""
    n = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    # pick the axis least aligned with n
    ref = jnp.where(jnp.abs(n[..., 0:1]) < 0.9,
                    jnp.asarray([1.0, 0.0, 0.0], n.dtype),
                    jnp.asarray([0.0, 1.0, 0.0], n.dtype))
    u = jnp.cross(n, ref)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    v = jnp.cross(n, u)
    return u, v


def project_to_plane(points, center, u, v):
    """3D points -> 2D plane-local coordinates."""
    rel = points - center
    return jnp.stack([jnp.sum(rel * u, axis=-1), jnp.sum(rel * v, axis=-1)], axis=-1)


def unproject_from_plane(pts2, center, u, v):
    return center + pts2[..., 0:1] * u + pts2[..., 1:2] * v


def convex_hull_by_angle(pts2, mask, max_verts: int = MAX_VERTS):
    """Star-shaped ordering of masked 2D points around their centroid, decimated to
    ``max_verts`` — the device-friendly stand-in for the reference's concave-hull
    boundary fit (third_party concave_fitting, noted unreliable in its own README).

    Returns (verts [max_verts, 2], count)."""
    n = pts2.shape[0]
    cnt = jnp.maximum(jnp.sum(mask), 1)
    centroid = jnp.sum(jnp.where(mask[:, None], pts2, 0.0), axis=0) / cnt
    rel = pts2 - centroid
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    ang = jnp.where(mask, ang, 1e9)  # masked points sort last
    order = jnp.argsort(ang)
    sorted_pts = pts2[order]
    sorted_mask = mask[order]

    # keep all points when they fit, else decimate evenly over the valid prefix
    valid_n = jnp.sum(mask)
    count = jnp.minimum(valid_n, max_verts)
    idx = jnp.minimum((jnp.arange(max_verts) * jnp.maximum(valid_n, 1))
                      // jnp.maximum(count, 1), n - 1)
    verts = sorted_pts[idx]
    vmask = sorted_mask[idx] & (jnp.arange(max_verts) < count)
    verts = jnp.where(vmask[:, None], verts, verts[0])
    return verts, count


def polygon_area(verts, count):
    """Shoelace area of the first ``count`` vertices (assumed ordered)."""
    v = verts
    nxt = jnp.roll(v, -1, axis=0)
    idx = jnp.arange(v.shape[0])
    active = idx < count
    # the edge from vertex count-1 wraps to vertex 0
    nxt = jnp.where((idx == count - 1)[:, None], v[0], nxt)
    cross = v[:, 0] * nxt[:, 1] - nxt[:, 0] * v[:, 1]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(active, cross, 0.0)))


def clip_polygon_halfplane(verts, count, a, b, c, max_out: int):
    """Sutherland-Hodgman clip of polygon by half-plane ``a x + b y <= c``.
    Masked, fixed-capacity.  Returns (verts [max_out, 2], count)."""
    n = verts.shape[0]
    idx = jnp.arange(n)
    active = idx < count
    cur = verts
    nxt = jnp.roll(verts, -1, axis=0)
    nxt = jnp.where((idx == count - 1)[:, None], verts[0], nxt)

    f_cur = a * cur[:, 0] + b * cur[:, 1] - c
    f_nxt = a * nxt[:, 0] + b * nxt[:, 1] - c
    cur_in = f_cur <= 0
    nxt_in = f_nxt <= 0

    denom = f_cur - f_nxt
    t = jnp.where(jnp.abs(denom) > 1e-12, f_cur / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
    inter = cur + t[:, None] * (nxt - cur)

    # each edge emits up to 2 points: cur (if inside), intersection (if crossing)
    emit_cur = active & cur_in
    emit_int = active & (cur_in ^ nxt_in)
    pts = jnp.stack([cur, inter], axis=1).reshape(2 * n, 2)
    emit = jnp.stack([emit_cur, emit_int], axis=1).reshape(2 * n)

    # compact: stable sort by ~emit keeps order of emitted points
    order = jnp.argsort(~emit, stable=True)
    out_pts = pts[order][:max_out]
    out_cnt = jnp.minimum(jnp.sum(emit), max_out)
    out_pts = jnp.where((jnp.arange(max_out) < out_cnt)[:, None], out_pts, out_pts[0])
    return out_pts, out_cnt


def convex_intersection_area(verts_a, count_a, verts_b, count_b):
    """Area of the intersection of two convex polygons (Sutherland-Hodgman: clip A by
    every edge of B)."""
    n_b = verts_b.shape[0]
    max_out = verts_a.shape[0] + n_b + 4

    pad = max_out - verts_a.shape[0]
    cur = jnp.pad(verts_a, ((0, pad), (0, 0)))
    cnt = count_a

    idx = jnp.arange(n_b)
    nxt = jnp.roll(verts_b, -1, axis=0)
    nxt = jnp.where((idx == count_b - 1)[:, None], verts_b[0], nxt)

    def body(i, carry):
        cur, cnt = carry
        p0 = verts_b[i]
        p1 = nxt[i]
        # inside = left of edge p0->p1 for CCW; use centroid sign to be orientation-safe
        e = p1 - p0
        a_coef = -e[1]
        b_coef = e[0]
        c_coef = a_coef * p0[0] + b_coef * p0[1]
        # orient so B's centroid is inside
        centroid = jnp.sum(
            jnp.where((jnp.arange(n_b) < count_b)[:, None], verts_b, 0.0), axis=0
        ) / jnp.maximum(count_b, 1)
        sign = jnp.where(a_coef * centroid[0] + b_coef * centroid[1] - c_coef <= 0, 1.0, -1.0)
        new_cur, new_cnt = clip_polygon_halfplane(
            cur, cnt, sign * a_coef, sign * b_coef, sign * c_coef, max_out)
        skip = i >= count_b
        return (jnp.where(skip, cur, new_cur), jnp.where(skip, cnt, new_cnt))

    cur, cnt = jax.lax.fori_loop(0, n_b, body, (cur, cnt))
    return polygon_area(cur, cnt)


def polygon_iou(verts_a, count_a, verts_b, count_b):
    """Inter-over-union of two convex polygons (reference: Polygon::inter_over_union,
    polygon.cpp:463-576, used by the plane-match gate, map_primitive.cpp:91-161)."""
    inter = convex_intersection_area(verts_a, count_a, verts_b, count_b)
    area_a = polygon_area(verts_a, count_a)
    area_b = polygon_area(verts_b, count_b)
    union = area_a + area_b - inter
    return jnp.where(union > 1e-9, inter / jnp.maximum(union, 1e-9), 0.0)


def inter_over_area(verts_a, count_a, verts_b, count_b):
    """Intersection over the smaller polygon's area (the reference's
    ``minimumPlaneOverlapToConsiderMatch`` semantics, parameters.hpp:91-92)."""
    inter = convex_intersection_area(verts_a, count_a, verts_b, count_b)
    area = jnp.minimum(polygon_area(verts_a, count_a), polygon_area(verts_b, count_b))
    return jnp.where(area > 1e-9, inter / jnp.maximum(area, 1e-9), 0.0)


def merge_polygons(verts_a, count_a, verts_b, count_b, max_verts: int = MAX_VERTS):
    """Union-merge: star-shaped re-hull of the combined vertex sets (reference:
    Polygon::merge/union keeping the largest component, polygon.cpp:463-576;
    plane_with_tracking.cpp:16-79 merges boundary polygons on track)."""
    all_pts = jnp.concatenate([verts_a, verts_b], axis=0)
    mask = jnp.concatenate([
        jnp.arange(verts_a.shape[0]) < count_a,
        jnp.arange(verts_b.shape[0]) < count_b])
    return convex_hull_by_angle(all_pts, mask, max_verts)
