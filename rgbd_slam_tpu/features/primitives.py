"""CAPE-style plane & cylinder extraction from the cell-organized depth cloud.

TPU-first redesign of reference src/features/primitives/ (plane_segment.cpp,
primitive_detection.cpp, cylinder_segment.cpp, histogram.hpp):

* per-cell plane fits: ONE batched moment computation + batched 3x3 eigh over all
  cells (replaces the sequential init_planar_cell_fitting loop,
  primitive_detection.cpp:187-237).  Moments are stored CENTERED (count, mean, M2)
  and combined with Chan's parallel-axis rule — additive like the reference's raw-sum
  ``expand_segment`` (plane_segment.cpp:170-190) but stable in f32 (see moments.py);
* region growing: the reference's recursive chained merge test
  (primitive_detection.cpp:778-818) is *pairwise between adjacent cells* — the merge
  decision compares the previously accepted cell's patch with the candidate cell — so
  mergeability becomes 4 precomputed directed edge maps and each seed's growth is
  masked label propagation to a fixpoint (`lax.while_loop`), no recursion;
* the seed loop (histogram most-frequent-bin -> min-MSE seed -> grow -> fit,
  primitive_detection.cpp:267-390) stays sequential but bounded (`lax.scan` over a
  static seed budget) — plane counts per frame are small;
* plane merging (primitive_detection.cpp:503-560) uses the cell-map adjacency matrix
  and pairwise moment combination;
* boundary polygons: cross-erode/square-dilate mask difference, cell-center points
  within 3 sqrt(MSE) of the plane (primitive_detection.cpp:650-703), star-hulled in
  the plane basis (convex stand-in for the unreliable concave hull, SURVEY.md §7).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, DetectionConfig
from ..geometry.covariances import get_depth_quantization
from ..ops.depth_cloud import depth_to_cloud, organize_by_cells
from ..utils import polygon as poly
from . import moments

MAX_PLANES = 16
MAX_CYLINDERS = 4
HIST_BINS = 20  # reference: Histogram<20>, histogram.hpp:20-133


class CellGrid(NamedTuple):
    """Per-cell plane-fit state, [C] leading axis (gh*gw cells row-major)."""
    count: jnp.ndarray       # [C] valid point count
    mean: jnp.ndarray        # [C, 3] centroid
    m2: jnp.ndarray          # [C, 3, 3] centered second moment
    normal: jnp.ndarray      # [C, 3]
    d: jnp.ndarray           # [C]
    mse: jnp.ndarray         # [C]
    score: jnp.ndarray       # [C]
    planar: jnp.ndarray      # [C] bool
    distance_tol: jnp.ndarray  # [C]


class DetectedPlanes(NamedTuple):
    params: jnp.ndarray      # [MAX_PLANES, 4] camera-space hessian [n, d]
    centroid: jnp.ndarray    # [MAX_PLANES, 3]
    mse: jnp.ndarray         # [MAX_PLANES]
    point_count: jnp.ndarray # [MAX_PLANES]
    cloud_cov: jnp.ndarray   # [MAX_PLANES, 3, 3] inverse raw moment matrix
    poly_verts: jnp.ndarray  # [MAX_PLANES, V, 2] plane-basis boundary polygon
    poly_count: jnp.ndarray  # [MAX_PLANES]
    basis_center: jnp.ndarray  # [MAX_PLANES, 3]
    basis_u: jnp.ndarray     # [MAX_PLANES, 3]
    basis_v: jnp.ndarray     # [MAX_PLANES, 3]
    cell_mask: jnp.ndarray   # [MAX_PLANES, C]
    valid: jnp.ndarray       # [MAX_PLANES] bool


class DetectedCylinders(NamedTuple):
    axis: jnp.ndarray        # [MAX_CYLINDERS, 3]
    center: jnp.ndarray      # [MAX_CYLINDERS, 3] point on axis
    radius: jnp.ndarray      # [MAX_CYLINDERS]
    mse: jnp.ndarray         # [MAX_CYLINDERS]
    valid: jnp.ndarray       # [MAX_CYLINDERS] bool


# ---------------------------------------------------------------------------
# per-cell fitting
# ---------------------------------------------------------------------------

def _cell_continuity(cell_z, patch: int):
    """Vectorized depth-continuity cross test (reference:
    is_cell_horizontal/vertical_continuous, plane_segment.cpp:62-100): scan the middle
    row and column; a jump above 4x the depth quantization breaks the cell."""
    mid = patch // 2

    def line_continuous(line):
        prev = line[:, :-1]
        nxt = line[:, 1:]
        both = (prev > 0) & (nxt > 0)
        jump = jnp.abs(nxt - prev) > 4.0 * get_depth_quantization(jnp.maximum(nxt, 1.0))
        return ~jnp.any(both & jump, axis=-1)

    return line_continuous(cell_z[:, mid, :]) & line_continuous(cell_z[:, :, mid])


def fit_plane_from_moments(cnt, mean, m2):
    """Closed-form eigen plane fit from centered moments (reference:
    Plane_Segment::fit_plane, plane_segment.cpp:232-284).  Batched.

    Returns (normal, d, centroid, mse, score, ok)."""
    from ..geometry.eig3 import sym_eig3_smallest

    safe = jnp.maximum(cnt, 1.0)
    cov = 0.5 * (m2 + jnp.swapaxes(m2, -1, -2))

    eigvals, normal = sym_eig3_smallest(cov)
    eigvals = jnp.abs(eigvals)  # ascending
    d = -jnp.sum(normal * mean, axis=-1)
    # orient normal toward the camera (d > 0), plane_segment.cpp:268-273
    flip = d <= 0
    normal = jnp.where(flip[..., None], -normal, normal)
    d = jnp.where(flip, -d, d)

    mse = eigvals[..., 0] / safe
    score = eigvals[..., 1] / jnp.maximum(eigvals[..., 0], 1e-6)
    ok = (cnt > 0) & jnp.all(jnp.isfinite(normal), axis=-1)
    return normal, d, mean, mse, score, ok


def fit_cells(cloud, valid, cfg: DetectionConfig = DetectionConfig()) -> CellGrid:
    """Batched plane fit of every depth-patch cell (reference:
    Plane_Segment::init_plane_segment, plane_segment.cpp:102-167)."""
    patch = cfg.depth_patch_size_px
    cells = organize_by_cells(cloud, patch)            # [C, P, 3]
    vmask = organize_by_cells(valid[..., None].astype(cloud.dtype), patch)[..., 0]
    c = cells.shape[0]
    ppc = patch * patch

    z_cells = cells[..., 2].reshape(c, patch, patch)
    continuous = _cell_continuity(z_cells, patch)

    cnt, mean, m2 = moments.from_points(cells, vmask)

    min_points = int(ppc * cfg.min_zero_depth_proportion)
    enough = (cnt >= min_points) & (cnt >= ppc // 2)

    normal, d, centroid, mse, score, fit_ok = fit_plane_from_moments(cnt, mean, m2)

    # planar iff MSE below squared depth quantization (plane_segment.cpp:164-167)
    planar = continuous & enough & fit_ok \
        & (mse <= get_depth_quantization(jnp.abs(centroid[..., 2])) ** 2)

    # dynamic per-cell merge distance tolerance (primitive_detection.cpp:210-227)
    sin_merge = math.sin(math.radians(cfg.max_plane_merge_angle_d))
    diameter = jnp.linalg.norm(cells[:, -1, :] - cells[:, 0, :], axis=-1)
    tol = jnp.minimum(cfg.max_plane_merge_distance_mm,
                      diameter * sin_merge * jnp.sqrt(jnp.maximum(cnt, 1.0)))
    tol = jnp.where(planar, tol, 0.0)

    return CellGrid(count=cnt, mean=mean, m2=m2, normal=normal, d=d,
                    mse=mse, score=score, planar=planar, distance_tol=tol)


# ---------------------------------------------------------------------------
# mergeability edges + label propagation
# ---------------------------------------------------------------------------

def _edge_maps(grid: CellGrid, gh: int, gw: int, cos_max: float):
    """Directed mergeability edges: edge[dir][y, x] = True when the neighbor in that
    direction may grow into cell (y, x) (reference merge test:
    Plane_Segment::can_be_merged, plane_segment.cpp:322-326, applied along the
    region-growing chain, primitive_detection.cpp:778-818)."""
    n = grid.normal.reshape(gh, gw, 3)
    d = grid.d.reshape(gh, gw)
    cen = grid.mean.reshape(gh, gw, 3)
    tol = grid.distance_tol.reshape(gh, gw)
    planar = grid.planar.reshape(gh, gw)

    edges = []
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        n_from = jnp.roll(n, (dy, dx), axis=(0, 1))
        d_from = jnp.roll(d, (dy, dx), axis=(0, 1))
        p_from = jnp.roll(planar, (dy, dx), axis=(0, 1))
        cos_ab = jnp.sum(n_from * n, axis=-1)
        dist = jnp.abs(jnp.sum(n_from * cen, axis=-1) + d_from)
        e = (cos_ab > cos_max) & (dist < tol) & planar & p_from
        if dx == 1:
            e = e.at[:, 0].set(False)
        if dx == -1:
            e = e.at[:, -1].set(False)
        if dy == 1:
            e = e.at[0, :].set(False)
        if dy == -1:
            e = e.at[-1, :].set(False)
        edges.append(e)
    return jnp.stack(edges)  # [4, gh, gw]


def _connected_components(edges, planar, gh: int, gw: int):
    """Connected components of the planar-cell mergeability graph as min-label
    propagation with pointer-jumping shortcuts.

    The reference grows each histogram seed recursively through pairwise merge
    tests (primitive_detection.cpp:778-818); the set a seed reaches is exactly its
    connected component under those (symmetrized) edge tests, so one fixpoint over
    the whole grid replaces every per-seed flood fill.  Returns [C] int32 labels
    (component = min member cell index; non-planar cells get the sentinel C)."""
    c = gh * gw
    planar2 = planar.reshape(gh, gw)
    # symmetric connectivity: growable in either direction across the shared edge
    sym_l = (edges[0] | jnp.roll(edges[1], 1, axis=1)).at[:, 0].set(False)
    sym_u = (edges[2] | jnp.roll(edges[3], 1, axis=0)).at[0, :].set(False)
    sym_r = jnp.roll(sym_l, -1, axis=1).at[:, -1].set(False)
    sym_d = jnp.roll(sym_u, -1, axis=0).at[-1, :].set(False)

    big = jnp.asarray(c, jnp.int32)
    lbl0 = jnp.where(planar2, jnp.arange(c, dtype=jnp.int32).reshape(gh, gw), big)

    def prop(lbl):
        nb = jnp.minimum(
            jnp.minimum(jnp.where(sym_l, jnp.roll(lbl, 1, axis=1), big),
                        jnp.where(sym_r, jnp.roll(lbl, -1, axis=1), big)),
            jnp.minimum(jnp.where(sym_u, jnp.roll(lbl, 1, axis=0), big),
                        jnp.where(sym_d, jnp.roll(lbl, -1, axis=0), big)))
        return jnp.where(planar2, jnp.minimum(lbl, nb), big)

    def body(state):
        lbl, _ = state
        new = prop(prop(lbl))
        # pointer jumping: labels are cell indices, so a cell may adopt its
        # label's own label (reachability is transitive) — turns O(diameter)
        # convergence into O(log diameter)
        flat = jnp.concatenate([new.reshape(-1), big[None]])
        new = jnp.minimum(new, flat[new.reshape(-1)].reshape(gh, gw))
        new = jnp.minimum(new, flat[new.reshape(-1)].reshape(gh, gw))
        return new, jnp.any(new != lbl)

    lbl, _ = jax.lax.while_loop(lambda s: s[1], body, (lbl0, jnp.asarray(True)))
    return lbl.reshape(-1)


def _normal_bins(normals):
    """Polar-angle histogram bin of each normal (reference: Histogram<20> binning
    over (acos(-nz), atan2(nx, ny)), histogram.hpp:35-122)."""
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    proj = jnp.arccos(jnp.clip(-nz, -1.0, 1.0))
    ang = jnp.arctan2(nx, ny)
    bx = jnp.clip((proj / jnp.pi * HIST_BINS).astype(jnp.int32), 0, HIST_BINS - 1)
    by = jnp.clip(((ang + jnp.pi) / (2 * jnp.pi) * HIST_BINS).astype(jnp.int32),
                  0, HIST_BINS - 1)
    return bx * HIST_BINS + by


# ---------------------------------------------------------------------------
# cylinder fitting (simplified batched variant of the sequential MSAC,
# cylinder_segment.cpp:35-225 — full MSAC parity tracked for a later round)
# ---------------------------------------------------------------------------

_CYL_MSAC_HYPOTHESES = 32
_CYL_TRUNC_MM = 40.0


def _kasa_fit(x, y, w):
    """Weighted algebraic (Kasa) circle fit -> (cx, cy, r)."""
    from ..pose.linalg6 import solve_spd

    a_mat = jnp.stack([2 * x * w, 2 * y * w, w], axis=-1)
    b_vec = (x * x + y * y) * w
    ata = a_mat.T @ a_mat + 1e-6 * jnp.eye(3, dtype=a_mat.dtype)
    sol = solve_spd(ata, a_mat.T @ b_vec)
    cx, cy, t = sol[0], sol[1], sol[2]
    return cx, cy, jnp.sqrt(jnp.maximum(t + cx * cx + cy * cy, 1e-9))


def _fit_cylinder(grid: CellGrid, active):
    """Cylinder fit over the activated cells (reference: Cylinder_Segment ctor,
    cylinder_segment.cpp:35-225): axis from the PCA of cell normals (cylinder
    normals are orthogonal to its axis, :47-105), then a truncated-distance MSAC
    over circumcircle hypotheses in the axis-orthogonal plane (:143-224 — the
    reference's sequential triplet RANSAC as a lockstep batch of deterministic
    scrambled triplets) and an inlier-weighted Kasa refit (:196-224).

    Returns (axis, center, radius, mse)."""
    w = (active & grid.planar).astype(grid.normal.dtype)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    from ..geometry.eig3 import sym_eig3_smallest

    nn = jnp.einsum("c,ci,cj->ij", w, grid.normal, grid.normal)
    _, axis = sym_eig3_smallest(nn)

    u, v = poly.plane_basis(axis)
    mean_c = jnp.sum(grid.mean * w[:, None], axis=0) / cnt
    p2 = poly.project_to_plane(grid.mean, mean_c, u, v)
    x, y = p2[:, 0], p2[:, 1]

    # --- MSAC over circumcircle triplets: compact active cells, deterministic
    # scrambled triplets (determinism parity with MAKE_DETERMINISTIC seeding)
    nc = grid.mean.shape[0]
    rank = jnp.cumsum((w > 0).astype(jnp.int32)) - 1
    na = jnp.maximum(jnp.sum((w > 0).astype(jnp.int32)), 1)
    compact = jnp.full((nc,), 0, jnp.int32).at[
        jnp.where(w > 0, rank, nc)].set(jnp.arange(nc, dtype=jnp.int32),
                                        mode="drop")
    b = _CYL_MSAC_HYPOTHESES
    tri = (jnp.arange(b * 3, dtype=jnp.uint32).reshape(b, 3)
           * jnp.uint32(2654435761)).astype(jnp.uint32) % na.astype(jnp.uint32)
    tri_idx = compact[tri.astype(jnp.int32)]     # [b, 3] cell indices
    tx = x[tri_idx]
    ty = y[tri_idx]

    # circumcircle through 3 points (perpendicular-bisector solve)
    ax_, ay_ = tx[:, 0], ty[:, 0]
    bx_, by_ = tx[:, 1], ty[:, 1]
    cx_, cy_ = tx[:, 2], ty[:, 2]
    d = 2.0 * (ax_ * (by_ - cy_) + bx_ * (cy_ - ay_) + cx_ * (ay_ - by_))
    d_safe = jnp.where(jnp.abs(d) < 1e-6, 1.0, d)
    ux_ = ((ax_ ** 2 + ay_ ** 2) * (by_ - cy_) + (bx_ ** 2 + by_ ** 2) * (cy_ - ay_)
           + (cx_ ** 2 + cy_ ** 2) * (ay_ - by_)) / d_safe
    uy_ = ((ax_ ** 2 + ay_ ** 2) * (cx_ - bx_) + (bx_ ** 2 + by_ ** 2) * (ax_ - cx_)
           + (cx_ ** 2 + cy_ ** 2) * (bx_ - ax_)) / d_safe
    hyp_r = jnp.sqrt((ax_ - ux_) ** 2 + (ay_ - uy_) ** 2)
    hyp_ok = jnp.abs(d) >= 1e-6

    # truncated MSAC score over all active cells
    dist = jnp.abs(jnp.sqrt(jnp.maximum(
        (x[None, :] - ux_[:, None]) ** 2 + (y[None, :] - uy_[:, None]) ** 2,
        1e-12)) - hyp_r[:, None])                       # [b, nc]
    trunc2 = _CYL_TRUNC_MM ** 2
    msac = jnp.sum(w[None, :] * jnp.minimum(dist * dist, trunc2), axis=-1)
    msac = jnp.where(hyp_ok, msac, jnp.inf)
    best = jnp.argmin(msac)

    # inlier-weighted Kasa refit
    inlier_w = w * (dist[best] < _CYL_TRUNC_MM)
    enough = jnp.sum(inlier_w) >= 3
    fit_w = jnp.where(enough, inlier_w, w)
    cx2, cy2, r2 = _kasa_fit(x, y, fit_w)

    dist2 = jnp.sqrt(jnp.maximum((x - cx2) ** 2 + (y - cy2) ** 2, 1e-12)) - r2
    wsum = jnp.maximum(jnp.sum(fit_w), 1.0)
    mse = jnp.sum(fit_w * dist2 * dist2) / wsum
    center3 = poly.unproject_from_plane(jnp.stack([cx2, cy2]), mean_c, u, v)
    return axis, center3, r2, mse


# ---------------------------------------------------------------------------
# main pipeline
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cam", "cfg"))
def find_primitives(depth_mm, cam: CameraIntrinsics,
                    cfg: DetectionConfig = DetectionConfig()):
    """Full CAPE extraction for one frame (reference:
    Primitive_Detection::find_primitives, primitive_detection.cpp:119-166).

    Returns (DetectedPlanes, DetectedCylinders)."""
    patch = cfg.depth_patch_size_px
    h, w = depth_mm.shape
    gh, gw = h // patch, w // patch
    n_cells = gh * gw
    dt = depth_mm.dtype

    cloud, valid = depth_to_cloud(depth_mm, cam)
    grid = fit_cells(cloud, valid, cfg)
    cos_max = math.cos(math.radians(cfg.max_plane_merge_angle_d))
    edges = _edge_maps(grid, gh, gw, cos_max)

    seed_threshold = max(1, int(cfg.min_plane_seed_proportion * n_cells))
    min_activated = max(1, int(cfg.min_cell_activated_proportion * n_cells))

    # --- all grown regions at once: connected components of the mergeability
    # graph (replaces the reference's sequential histogram-seed loop,
    # primitive_detection.cpp:267-390 — each seed grows to exactly its component,
    # so the K largest components ARE the seed loop's outputs, batched)
    comp = _connected_components(edges, grid.planar, gh, gw)      # [C]
    sizes = jax.ops.segment_sum(grid.planar.astype(jnp.int32), comp,
                                num_segments=n_cells + 1)[:n_cells]
    k_cand = MAX_PLANES + MAX_CYLINDERS
    cand_sizes, cand_roots = jax.lax.top_k(sizes, k_cand)          # [K]
    member = (comp[None, :] == cand_roots[:, None]) & (cand_sizes[:, None] > 0)

    cnt, mean, m2 = jax.vmap(
        lambda msk: moments.combine(grid.count, grid.mean, grid.m2, msk))(member)
    normal, d, centroid, mse, score, fit_ok = fit_plane_from_moments(cnt, mean, m2)

    # histogram seed gate (parity with the top-bin >= seedCount loop condition,
    # primitive_detection.cpp:278): the component's orientation bin must hold at
    # least seed_threshold planar cells frame-wide
    bins = _normal_bins(grid.normal)
    bin_counts = jax.ops.segment_sum(grid.planar.astype(jnp.int32), bins,
                                     num_segments=HIST_BINS * HIST_BINS)
    cand_bins = _normal_bins(normal)
    bin_gate = bin_counts[cand_bins] >= seed_threshold

    grown_ok = (cand_sizes >= min_activated) & bin_gate & fit_ok

    # plane-vs-cylinder model choice (primitive_detection.cpp:375-388, 437-476)
    is_plane = grown_ok & (score > 100.0)
    try_cyl = grown_ok & ~is_plane & (cand_sizes > 5)
    cy_axis, cy_center, cy_r, cy_mse = jax.vmap(
        lambda msk: _fit_cylinder(grid, msk))(member)
    cyl_better = try_cyl & (cy_mse < mse)
    accept_plane = is_plane | (try_cyl & ~cyl_better)

    def compact_to(cap, accept, *arrays):
        """Scatter accepted candidates (size-ranked) into the first ``cap`` slots."""
        rank = jnp.cumsum(accept.astype(jnp.int32)) - 1
        dest = jnp.where(accept & (rank < cap), rank, cap)
        num = jnp.minimum(jnp.sum(accept.astype(jnp.int32)), cap)
        outs = []
        for a, fill in arrays:
            out = jnp.full((cap,) + a.shape[1:], fill, a.dtype)
            outs.append(out.at[dest].set(a, mode="drop"))
        return num, outs

    p_num, (p_cnt, p_mean, p_m2, p_cellmask) = compact_to(
        MAX_PLANES, accept_plane,
        (cnt, 0), (mean, 0), (m2, 0), (member, False))
    c_num, (c_axis, c_center, c_radius, c_mse) = compact_to(
        MAX_CYLINDERS, cyl_better,
        (cy_axis, 0), (cy_center, 0), (cy_r, 0), (cy_mse, jnp.inf))

    plane_valid = jnp.arange(MAX_PLANES) < p_num

    p_cnt, p_mean, p_m2, p_cellmask, plane_valid = _merge_planes(
        p_cnt, p_mean, p_m2, p_cellmask, plane_valid, gh, gw, cos_max,
        cfg.max_plane_merge_distance_mm)

    normal, d, centroid, mse, score, fit_ok = fit_plane_from_moments(
        p_cnt, p_mean, p_m2)
    plane_valid = plane_valid & fit_ok
    params = jnp.concatenate([normal, d[..., None]], axis=-1)

    # plane-parameter covariance source: inverse raw moment matrix
    # (Plane_Segment::get_point_cloud_covariance, plane_segment.cpp:192-203),
    # norm-scaled before inversion for f32 conditioning
    from ..pose.linalg6 import solve_spd

    raw = moments.raw_second_moment(p_cnt, p_mean, p_m2)
    scale = jnp.maximum(jnp.linalg.norm(raw, axis=(-2, -1), keepdims=True), 1.0)
    cloud_cov = solve_spd(raw / scale + 1e-9 * jnp.eye(3, dtype=dt),
                          jnp.broadcast_to(jnp.eye(3, dtype=dt), raw.shape)) / scale

    planes_out = _build_plane_boundaries(
        params, centroid, mse, p_cnt, cloud_cov, p_cellmask, plane_valid,
        cloud, valid, gh, gw, patch)

    cylinders = DetectedCylinders(
        axis=c_axis, center=c_center, radius=c_radius, mse=c_mse,
        valid=jnp.arange(MAX_CYLINDERS) < c_num)
    return planes_out, cylinders


def _merge_planes(p_cnt, p_mean, p_m2, p_cellmask, plane_valid, gh, gw,
                  cos_max, max_dist):
    """Merge adjacent co-planar grown planes (primitive_detection.cpp:503-560).

    TPU design: instead of the reference's sequential pairwise scan over the
    connected-components matrix, build the full mergeability matrix once, take its
    transitive closure with log2(MAX_PLANES) boolean matmuls, and fold every merge
    group onto its minimum-index representative with one masked moment combine."""
    cell_maps = p_cellmask.reshape(MAX_PLANES, gh, gw)
    right = jnp.roll(cell_maps, -1, axis=2).at[:, :, -1].set(False)
    below = jnp.roll(cell_maps, -1, axis=1).at[:, -1, :].set(False)
    adj = jnp.zeros((MAX_PLANES, MAX_PLANES), bool)
    for shifted in (right, below):
        overlap = jnp.einsum("ahw,bhw->ab", cell_maps.astype(jnp.float32),
                             shifted.astype(jnp.float32)) > 0
        adj = adj | overlap | overlap.T

    n, d, cen, _, _, _ = fit_plane_from_moments(p_cnt, p_mean, p_m2)
    cos_ij = n @ n.T
    dist_ij = jnp.abs(jnp.einsum("ik,jk->ij", n, cen) + d[:, None])
    ok = plane_valid[:, None] & plane_valid[None, :]
    m = adj & ok & (cos_ij > cos_max) & ((dist_ij < max_dist) | (dist_ij.T < max_dist))
    m = m | jnp.eye(MAX_PLANES, dtype=bool)

    for _ in range(4):  # closure: path length doubles per squaring, 2^4 >= MAX_PLANES
        m = (m.astype(jnp.float32) @ m.astype(jnp.float32)) > 0
    root = jnp.argmax(m, axis=1)  # first connected index = representative

    group = (root[None, :] == jnp.arange(MAX_PLANES)[:, None]) & plane_valid[None, :]
    p_cnt, p_mean, p_m2 = jax.vmap(
        lambda msk: moments.combine(p_cnt, p_mean, p_m2, msk))(group)
    p_cellmask = jnp.einsum("gi,ic->gc", group.astype(jnp.float32),
                            p_cellmask.astype(jnp.float32)) > 0
    plane_valid = plane_valid & (root == jnp.arange(MAX_PLANES))
    return p_cnt, p_mean, p_m2, p_cellmask, plane_valid


def _build_plane_boundaries(params, centroid, mse, p_count, cloud_cov, p_cellmask,
                            plane_valid, cloud, valid, gh, gw, patch):
    """Boundary polygon per plane (primitive_detection.cpp:650-703): cross-erode /
    square-dilate mask difference, cell-center camera points within 3 sqrt(MSE) of the
    plane, star hull in the plane basis."""
    cell_maps = p_cellmask.reshape(MAX_PLANES, gh, gw)

    def erode_cross(m):
        return m & jnp.roll(m, 1, 1).at[:, 0].set(False) \
            & jnp.roll(m, -1, 1).at[:, -1].set(False) \
            & jnp.roll(m, 1, 0).at[0, :].set(False) \
            & jnp.roll(m, -1, 0).at[-1, :].set(False)

    def dilate_square(m):
        out = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = jnp.roll(m, (dy, dx), (0, 1))
                if dy == 1:
                    s = s.at[0, :].set(False)
                if dy == -1:
                    s = s.at[-1, :].set(False)
                if dx == 1:
                    s = s.at[:, 0].set(False)
                if dx == -1:
                    s = s.at[:, -1].set(False)
                out = out | s
        return out

    cy = jnp.arange(gh) * patch + patch // 2
    cx = jnp.arange(gw) * patch + patch // 2
    centers = cloud[cy[:, None], cx[None, :]]      # [gh, gw, 3]
    centers_valid = valid[cy[:, None], cx[None, :]]

    def one_plane(cmap, plane4, pmse, pvalid):
        boundary = dilate_square(cmap) & ~erode_cross(cmap)
        dist = jnp.abs(jnp.sum(plane4[:3] * centers, axis=-1) + plane4[3])
        in_plane = boundary & centers_valid \
            & (dist < 3.0 * jnp.sqrt(jnp.maximum(pmse, 1e-6)) + 1.0)
        pts = centers.reshape(-1, 3)
        mask = in_plane.reshape(-1) & pvalid

        center3 = plane4[:3] * (-plane4[3])
        u, v = poly.plane_basis(plane4[:3])
        pts2 = poly.project_to_plane(pts, center3, u, v)
        verts, count = poly.convex_hull_by_angle(pts2, mask)
        ok = pvalid & (count >= 3)  # >=3 vertices (primitive_detection.cpp:614-633)
        return verts, count, center3, u, v, ok

    verts, counts, centers3, us, vs, ok = jax.vmap(one_plane)(
        cell_maps, params, mse, plane_valid)

    return DetectedPlanes(
        params=params, centroid=centroid, mse=mse, point_count=p_count,
        cloud_cov=cloud_cov, poly_verts=verts, poly_count=counts,
        basis_center=centers3, basis_u=us, basis_v=vs,
        cell_mask=p_cellmask, valid=ok)
