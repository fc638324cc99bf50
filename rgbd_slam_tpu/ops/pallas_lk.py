"""Pallas TPU kernels for pyramidal Lucas-Kanade iteration.

The XLA formulation of LK (ops/optical_flow.py) runs ~100 sequential HLO steps of
vmapped dynamic slices — far from roofline on TPU.  Two kernels live here:

* :func:`lk_pyramid_pallas` — the production path: ONE kernel per tracking
  direction runs the ENTIRE pyramid (all levels x all iterations) with every
  pyramid level resident in VMEM.  Window reads slice an aligned 256-lane slab
  and rotate within it, so the per-sample cost is independent of image width.
* :func:`lk_level_pallas` — the original single-level kernel, kept for
  level-by-level testing.

Per-point coordinates ride in SMEM via scalar prefetch; window slices and
reductions never leave VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lk_kernel(pts_ref, guess_ref, valid_ref, prev_ref, next_ref,
               out_g_ref, out_ok_ref, *, win_h: int, win_w: int,
               iterations: int, eps: float, lh: int, lw: int):
    # lh/lw are the TRUE image dims; the refs are padded to (8, 128) alignment
    i = pl.program_id(0)

    px = pts_ref[i, 0]
    py = pts_ref[i, 1]
    gx0 = guess_ref[i, 0]
    gy0 = guess_ref[i, 1]
    valid = valid_ref[i] > 0

    half_x = (win_w - 1) / 2.0
    half_y = (win_h - 1) / 2.0
    tlx = jnp.clip(px - half_x, 2.0, lw - win_w - 3.0)
    tly = jnp.clip(py - half_y, 2.0, lh - win_h - 3.0)

    def sample(ref, x, y, h, w):
        """Bilinear window [h, w] with float top-left (x, y).

        Mosaic cannot dynamically slice the lane (last) dimension, so rows are
        loaded full-width and rotated into place with a dynamic lane roll."""
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0).astype(jnp.float32)
        fy = (y - y0).astype(jnp.float32)
        xi = jnp.clip(x0.astype(jnp.int32), 0, lw - (w + 1))
        yi = jnp.clip(y0.astype(jnp.int32), 0, lh - (h + 1))
        # sublane starts must be 8-aligned: load from an aligned base and rotate
        hs = -(-(h + 9) // 8) * 8
        yi_al = jnp.clip((yi // 8) * 8, 0, (ref.shape[0] - hs) // 8 * 8)
        yi_al = pl.multiple_of(yi_al, 8)
        rows = ref[pl.ds(yi_al, hs), :]              # [hs, pw]
        rows = pltpu.roll(rows, -(yi - yi_al), axis=0)
        rolled = pltpu.roll(rows, -xi, axis=1)       # columns xi.. now at 0..
        p = rolled[:h + 1, :w + 1]
        return ((1 - fy) * ((1 - fx) * p[:h, :w] + fx * p[:h, 1:w + 1])
                + fy * ((1 - fx) * p[1:h + 1, :w] + fx * p[1:h + 1, 1:w + 1]))

    # template + gradients from one haloed patch of the previous image
    tp = sample(prev_ref, tlx - 1.0, tly - 1.0, win_h + 2, win_w + 2)
    t = tp[1:-1, 1:-1]
    ix = 0.5 * (tp[1:-1, 2:] - tp[1:-1, :-2])
    iy = 0.5 * (tp[2:, 1:-1] - tp[:-2, 1:-1])

    gxx = jnp.sum(ix * ix)
    gxy = jnp.sum(ix * iy)
    gyy = jnp.sum(iy * iy)
    det = gxx * gyy - gxy * gxy
    ok = (det > 1e-6) & valid
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)

    def body(_, carry):
        gx, gy, done = carry
        j = sample(next_ref, tlx + gx, tly + gy, win_h, win_w)
        diff = t - j
        bx = jnp.sum(ix * diff)
        by = jnp.sum(iy * diff)
        dx = (gyy * bx - gxy * by) * inv_det
        dy = (gxx * by - gxy * bx) * inv_det
        new_gx = jnp.where(done, gx, gx + dx)
        new_gy = jnp.where(done, gy, gy + dy)
        done = done | (dx * dx + dy * dy < eps * eps)
        return new_gx, new_gy, done

    gx, gy, _ = jax.lax.fori_loop(
        0, iterations, body, (gx0, gy0, jnp.logical_not(ok)))

    # vector stores (scalar stores to VMEM are not supported)
    out_g_ref[pl.ds(i, 1), :] = jnp.stack([gx, gy]).reshape(1, 2)
    out_ok_ref[pl.ds(i, 1), :] = ok.astype(jnp.int32).reshape(1, 1)


_SLAB = 256  # aligned lane slab: window width + worst-case 128 misalignment

# NOTE: bf16 slabs were tried to halve the dynamic-roll register traffic and
# rejected: Mosaic lane rotates are 32-bit only ("Rotate with non-32-bit data
# not implemented").


def _pad_level(img):
    """Pad a pyramid level to Mosaic-friendly (8k+8, 128k) with edge values."""
    lh, lw = img.shape
    ph = -(-lh // 8) * 8 + 8
    pw = max(-(-lw // 128) * 128, _SLAB)
    return jnp.pad(img, ((0, ph - lh), (0, pw - lw)), mode="edge")


def _sample_slab(ref, x, y, h: int, w: int, lh: int, lw: int):
    """Bilinear [h, w] window with float top-left (x, y) from a VMEM image ref.

    Loads one (8-aligned sublane) x (128-aligned lane) slab covering the window
    and rotates it into place — per-sample cost is O(slab), not O(image width).
    The LANE roll runs first so the slab can be statically narrowed to one
    128-lane tile before the SUBLANE roll — the second rotate then moves half
    the data (windows are <= 127 wide by construction)."""
    assert w + 1 <= 128
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    xi = jnp.clip(x0.astype(jnp.int32), 0, lw - (w + 1))
    yi = jnp.clip(y0.astype(jnp.int32), 0, lh - (h + 1))
    hs = -(-(h + 9) // 8) * 8
    yi_al = jnp.clip((yi // 8) * 8, 0, (ref.shape[0] - hs) // 8 * 8)
    yi_al = pl.multiple_of(yi_al, 8)
    xi_al = jnp.clip((xi // 128) * 128, 0, ref.shape[1] - _SLAB)
    xi_al = pl.multiple_of(xi_al, 128)
    slab = ref[pl.ds(yi_al, hs), pl.ds(xi_al, _SLAB)]
    slab = pltpu.roll(slab, -(xi - xi_al), axis=1)[:, :128]
    slab = pltpu.roll(slab, -(yi - yi_al), axis=0)
    p = slab[:h + 1, :w + 1]
    return ((1 - fy) * ((1 - fx) * p[:h, :w] + fx * p[:h, 1:w + 1])
            + fy * ((1 - fx) * p[1:h + 1, :w] + fx * p[1:h + 1, 1:w + 1]))


def _sample_slab_mm(ref, x, y, h: int, w: int, lh: int, lw: int):
    """Bilinear [h, w] window via MXU matmuls: ``P_y @ slab @ R_x``.

    The dynamic lane/sublane rolls of :func:`_sample_slab` serialize ~10
    log-stage vector permutes per sample; here alignment AND the 4-tap
    bilinear blend fold into two banded one-hot matrices so the whole sample
    is two small matmuls the MXU pipelines across the batch:

      R_x[c, j] = (c == xo+j)(1-fx) + (c == xo+j+1) fx      [SLAB, w]
      P_y[i, r] = (r == yo+i)(1-fy) + (r == yo+i+1) fy      [h, hs]
      window    = P_y @ (slab @ R_x)                        [h, w]

    Exactness: the banded matrices hold each row's two bilinear taps, so the
    contraction reproduces the 4-tap blend up to matmul precision (HIGHEST =
    f32-accurate bf16x6 passes on TPU)."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(jnp.float32)
    fy = (y - y0).astype(jnp.float32)
    xi = jnp.clip(x0.astype(jnp.int32), 0, lw - (w + 1))
    yi = jnp.clip(y0.astype(jnp.int32), 0, lh - (h + 1))
    hs = -(-(h + 9) // 8) * 8
    yi_al = jnp.clip((yi // 8) * 8, 0, (ref.shape[0] - hs) // 8 * 8)
    yi_al = pl.multiple_of(yi_al, 8)
    xi_al = jnp.clip((xi // 128) * 128, 0, ref.shape[1] - _SLAB)
    xi_al = pl.multiple_of(xi_al, 128)
    slab = ref[pl.ds(yi_al, hs), pl.ds(xi_al, _SLAB)]     # [hs, SLAB]
    xo = xi - xi_al                                        # 0..127
    yo = yi - yi_al                                        # 0..hs-h-1

    # banded bilinear weights as a linear tent: w(c) = max(0, 1 - |c - x*|)
    # puts (1-f, f) on the two taps in 4 vector ops, no boolean selects
    col = jax.lax.broadcasted_iota(jnp.int32, (_SLAB, w), 0)
    tap = jax.lax.broadcasted_iota(jnp.int32, (_SLAB, w), 1) + xo
    r_x = jnp.maximum(0.0, 1.0 - jnp.abs((col - tap).astype(jnp.float32) - fx))
    row = jax.lax.broadcasted_iota(jnp.int32, (h, hs), 1)
    tap_y = jax.lax.broadcasted_iota(jnp.int32, (h, hs), 0) + yo
    p_y = jnp.maximum(0.0,
                      1.0 - jnp.abs((row - tap_y).astype(jnp.float32) - fy))
    tmp = jnp.dot(slab, r_x, precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(p_y, tmp, precision=jax.lax.Precision.HIGHEST)


def _lk_pyramid_kernel(pts_ref, valid_ref, *refs, levels: int, dims: tuple,
                       wins: tuple, iterations: int, eps: float):
    """Track one point through every pyramid level (grid = one step per point).

    ``refs`` = prev levels [0..levels], next levels [0..levels], then the two
    output refs (flow [N, 2], ok [N, 1])."""
    prev_refs = refs[:levels + 1]
    next_refs = refs[levels + 1:2 * levels + 2]
    out_g_ref, out_ok_ref = refs[2 * levels + 2], refs[2 * levels + 3]

    i = pl.program_id(0)
    px = pts_ref[i, 0]
    py = pts_ref[i, 1]
    valid = valid_ref[i] > 0

    gx = jnp.float32(0.0)
    gy = jnp.float32(0.0)
    ok = valid

    for lvl in range(levels, -1, -1):
        lh, lw = dims[lvl]
        wh, ww = wins[lvl]
        scale = jnp.float32(0.5 ** lvl)
        tlx = jnp.clip(px * scale - (ww - 1) / 2.0, 2.0, lw - ww - 3.0)
        tly = jnp.clip(py * scale - (wh - 1) / 2.0, 2.0, lh - wh - 3.0)

        tp = _sample_slab(prev_refs[lvl], tlx - 1.0, tly - 1.0,
                          wh + 2, ww + 2, lh, lw)
        t = tp[1:-1, 1:-1]
        ix = 0.5 * (tp[1:-1, 2:] - tp[1:-1, :-2])
        iy = 0.5 * (tp[2:, 1:-1] - tp[:-2, 1:-1])
        gxx = jnp.sum(ix * ix)
        gxy = jnp.sum(ix * iy)
        gyy = jnp.sum(iy * iy)
        det = gxx * gyy - gxy * gxy
        lvl_ok = (det > 1e-6) & valid
        if lvl == 0:  # cv parity: only the finest level sets status
            ok = ok & lvl_ok
        inv_det = jnp.where(lvl_ok, 1.0 / jnp.where(lvl_ok, det, 1.0), 0.0)

        def body(carry, tlx=tlx, tly=tly, t=t, ix=ix, iy=iy, gxx=gxx,
                 gxy=gxy, gyy=gyy, inv_det=inv_det, nref=next_refs[lvl],
                 wh=wh, ww=ww, lh=lh, lw=lw):
            it, cgx, cgy, done = carry
            j = _sample_slab(nref, tlx + cgx, tly + cgy, wh, ww, lh, lw)
            diff = t - j
            bx = jnp.sum(ix * diff)
            by = jnp.sum(iy * diff)
            dx = (gyy * bx - gxy * by) * inv_det
            dy = (gxx * by - gxy * bx) * inv_det
            done = done | (dx * dx + dy * dy < eps * eps)
            return it + 1, cgx + dx, cgy + dy, done

        # true early exit: converged points stop sampling (the XLA path can only
        # mask lockstep iterations; here each grid step is one point, so its
        # while_loop really terminates)
        _, gx, gy, _ = jax.lax.while_loop(
            lambda c: (c[0] < iterations) & jnp.logical_not(c[3]),
            body, (jnp.int32(0), gx, gy, jnp.logical_not(lvl_ok)))
        if lvl > 0:
            gx = gx * 2.0
            gy = gy * 2.0

    out_g_ref[pl.ds(i, 1), :] = jnp.stack([gx, gy]).reshape(1, 2)
    out_ok_ref[pl.ds(i, 1), :] = ok.astype(jnp.int32).reshape(1, 1)


def _track_direction(src_refs, dst_refs, px, py, valid, *, levels: int,
                     dims: tuple, wins: tuple, iterations: int, eps: float,
                     top_level: int | None = None,
                     sample_fn=_sample_slab):
    """Coarse-to-fine LK for a GROUP of points (python lists of scalars).

    The group advances each level in lockstep (one while_loop whose carry holds
    every point's guess); the B independent per-point chains inside the body
    give Mosaic instruction-level parallelism to hide the cross-lane reduction
    and roll latencies that serialize a one-point-per-grid-step kernel.

    ``top_level`` starts the zero-seeded coarse-to-fine sweep below the
    pyramid top (used by the short backward pass)."""
    batch = len(px)
    top = levels if top_level is None else top_level
    gx = [jnp.float32(0.0)] * batch
    gy = [jnp.float32(0.0)] * batch
    ok = list(valid)

    for lvl in range(top, -1, -1):
        lh, lw = dims[lvl]
        wh, ww = wins[lvl]
        scale = jnp.float32(0.5 ** lvl)
        tlx, tly, t, ix, iy = [], [], [], [], []
        gxx, gxy, gyy, inv_det = [], [], [], []
        for b in range(batch):
            bx_ = jnp.clip(px[b] * scale - (ww - 1) / 2.0, 2.0, lw - ww - 3.0)
            by_ = jnp.clip(py[b] * scale - (wh - 1) / 2.0, 2.0, lh - wh - 3.0)
            tp = sample_fn(src_refs[lvl], bx_ - 1.0, by_ - 1.0,
                           wh + 2, ww + 2, lh, lw)
            tb = tp[1:-1, 1:-1]
            ixb = 0.5 * (tp[1:-1, 2:] - tp[1:-1, :-2])
            iyb = 0.5 * (tp[2:, 1:-1] - tp[:-2, 1:-1])
            a = jnp.sum(ixb * ixb)
            bq = jnp.sum(ixb * iyb)
            c = jnp.sum(iyb * iyb)
            det = a * c - bq * bq
            lvl_ok = (det > 1e-6) & valid[b]
            # cv parity (calcOpticalFlowPyrLK): a singular structure tensor at
            # a COARSE level skips that level's refinement (inv_det = 0 below)
            # but does not fail the track — only the finest level sets status.
            # Weak-texture regions often have enough gradient at full
            # resolution while their downsampled coarse windows are flat.
            if lvl == 0:
                ok[b] = ok[b] & lvl_ok
            tlx.append(bx_)
            tly.append(by_)
            t.append(tb)
            ix.append(ixb)
            iy.append(iyb)
            gxx.append(a)
            gxy.append(bq)
            gyy.append(c)
            inv_det.append(jnp.where(lvl_ok, 1.0 / jnp.where(lvl_ok, det, 1.0),
                                     0.0))

        def body(carry, lvl=lvl, tlx=tlx, tly=tly, t=t, ix=ix, iy=iy,
                 gxx=gxx, gxy=gxy, gyy=gyy, inv_det=inv_det,
                 wh=wh, ww=ww, lh=lh, lw=lw):
            it, cgx, cgy, done = carry
            ngx, ngy, ndone = [], [], []
            for b in range(batch):
                j = sample_fn(dst_refs[lvl], tlx[b] + cgx[b],
                              tly[b] + cgy[b], wh, ww, lh, lw)
                diff = t[b] - j
                bx = jnp.sum(ix[b] * diff)
                by = jnp.sum(iy[b] * diff)
                dx = jnp.where(done[b], 0.0,
                               (gyy[b] * bx - gxy[b] * by) * inv_det[b])
                dy = jnp.where(done[b], 0.0,
                               (gxx[b] * by - gxy[b] * bx) * inv_det[b])
                ngx.append(cgx[b] + dx)
                ngy.append(cgy[b] + dy)
                ndone.append(done[b] | (dx * dx + dy * dy < eps * eps))
            return it + 1, tuple(ngx), tuple(ngy), tuple(ndone)

        def cond(carry):
            it, _, _, done = carry
            all_done = done[0]
            for b in range(1, batch):
                all_done = all_done & done[b]
            return (it < iterations) & jnp.logical_not(all_done)

        done0 = tuple(jnp.logical_not(o) for o in ok)
        _, gx_t, gy_t, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tuple(gx), tuple(gy), done0))
        gx, gy = list(gx_t), list(gy_t)
        if lvl > 0:
            gx = [g * 2.0 for g in gx]
            gy = [g * 2.0 for g in gy]
    return gx, gy, ok


def _lk_fwd_bwd_kernel(pts_ref, valid_ref, *refs, levels: int, dims: tuple,
                       wins: tuple, iterations: int, eps: float, batch: int,
                       max_roundtrip: float, bwd_levels: int | None = None,
                       mm_sample: bool = False):
    """Forward + backward pyramidal LK + round-trip gate for ``batch`` points
    per grid step, all in one kernel launch (reference behavior:
    get_keypoints_from_optical_flow, keypoint_detection.cpp:262-361).

    ``bwd_levels`` < ``levels`` runs the backward validation pass over fewer
    pyramid levels, ZERO-seeded from ``bwd_levels`` down (negated-forward-flow
    seeding was measured and rejected as biased: it pre-answers the round-trip
    question) — the gate's question ("does this track return home?") is asked
    at full resolution directly instead of re-deriving the coarse
    initialization the forward pass already produced.  Documented deviation
    from the reference
    (which makes a second full-pyramid cv call, keypoint_detection.cpp:329):
    gate semantics are preserved, downstream RANSAC still catches any
    association this lets through, and the bench ATE is the acceptance test."""
    prev_refs = refs[:levels + 1]
    next_refs = refs[levels + 1:2 * levels + 2]
    out_g_ref, out_ok_ref = refs[2 * levels + 2], refs[2 * levels + 3]

    i = pl.program_id(0)
    base = i * batch
    px = [pts_ref[base + b, 0] for b in range(batch)]
    py = [pts_ref[base + b, 1] for b in range(batch)]
    valid = [valid_ref[base + b] > 0 for b in range(batch)]

    kw = dict(levels=levels, dims=dims, wins=wins, iterations=iterations,
              eps=eps, sample_fn=_sample_slab_mm if mm_sample else _sample_slab)
    fgx, fgy, fok = _track_direction(prev_refs, next_refs, px, py, valid, **kw)
    fx = [px[b] + fgx[b] for b in range(batch)]
    fy = [py[b] + fgy[b] for b in range(batch)]
    if bwd_levels is None:
        # full parity: second full-pyramid pass, no initial flow (cv behavior)
        bgx, bgy, bok = _track_direction(next_refs, prev_refs, fx, fy, fok,
                                         **kw)
    else:
        # short validation pass: zero-seeded like the reference's (seeding
        # with -forward would bias the gate toward passing its own answer),
        # starting at bwd_levels — the skipped coarse levels only matter for
        # flows beyond the start level's convergence basin, which the
        # round-trip gate rejects either way
        bgx, bgy, bok = _track_direction(
            next_refs, prev_refs, fx, fy, fok, top_level=bwd_levels, **kw)

    outs_g = []
    outs_ok = []
    for b in range(batch):
        # backward track should land on the original point
        rt2 = (fgx[b] + bgx[b]) ** 2 + (fgy[b] + bgy[b]) ** 2
        ok = fok[b] & bok[b] & (rt2 <= max_roundtrip * max_roundtrip)
        outs_g.append(jnp.stack([fx[b], fy[b]]))
        outs_ok.append(ok.astype(jnp.int32))
    out_g_ref[pl.ds(base, batch), :] = jnp.stack(outs_g)
    out_ok_ref[pl.ds(base, batch), :] = jnp.stack(outs_ok).reshape(batch, 1)


@partial(jax.jit, static_argnames=("levels", "win_h", "win_w", "iterations",
                                   "eps", "batch", "max_roundtrip", "interpret",
                                   "bwd_levels", "coarse_win",
                                   "coarse_from_level", "mm_sample"))
def lk_fwd_bwd_pallas(prev_pyramid, next_pyramid, points, valid,
                      levels: int = 4, win_h: int = 53, win_w: int = 53,
                      iterations: int = 10, eps: float = 0.03,
                      batch: int = 8, max_roundtrip: float = 35.0,
                      interpret: bool = False, bwd_levels: int | None = None,
                      coarse_win: int | None = None,
                      coarse_from_level: int = 1,
                      mm_sample: bool = False):
    """Fused forward+backward pyramidal LK with the round-trip gate.

    Returns (tracked_points [N, 2], ok [N] bool).  One kernel launch tracks
    ``batch`` points per grid step — the independent chains give the VPU
    instruction-level parallelism that the one-point-per-step kernel lacks.

    ``coarse_win`` (deviation, ATE-gated): window side for pyramid levels
    >= ``coarse_from_level``.  cv (and the reference) reuse the full winSize
    at every level, so a level-k window already spans 2^k x the level-0
    aggregation scale; a smaller coarse window keeps the full-resolution
    coverage monotone while shrinking the per-iteration slab-roll and
    register traffic at the levels where most iterations run.  Applying it
    only from level 2 up preserves the wide level-1 search basin that the
    occlusion-burst (hard-scene) tracking depends on."""
    n = points.shape[0]
    assert n % batch == 0, f"point count {n} must be a multiple of {batch}"
    dims = tuple((int(p.shape[0]), int(p.shape[1]))
                 for p in prev_pyramid[:levels + 1])
    wins = tuple(
        (min(win_h if lvl < coarse_from_level else (coarse_win or win_h),
             lh - 8),
         min(win_w if lvl < coarse_from_level else (coarse_win or win_w),
             lw - 8))
        for lvl, (lh, lw) in enumerate(dims))
    prev_pad = [_pad_level(p) for p in prev_pyramid[:levels + 1]]
    next_pad = [_pad_level(p) for p in next_pyramid[:levels + 1]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // batch,),
        in_specs=[pl.BlockSpec(img.shape, lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)
                  for img in prev_pad + next_pad],
        out_specs=[
            pl.BlockSpec((n, 2), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    out_g, out_ok = pl.pallas_call(
        partial(_lk_fwd_bwd_kernel, levels=levels, dims=dims, wins=wins,
                iterations=iterations, eps=eps, batch=batch,
                max_roundtrip=max_roundtrip, bwd_levels=bwd_levels,
                mm_sample=mm_sample),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(points.astype(jnp.float32), valid.astype(jnp.int32),
      *prev_pad, *next_pad)
    return out_g, out_ok[:, 0] > 0


@partial(jax.jit, static_argnames=("levels", "win_h", "win_w", "iterations",
                                   "eps", "interpret"))
def lk_pyramid_pallas(prev_pyramid, next_pyramid, points, valid,
                      levels: int = 4, win_h: int = 53, win_w: int = 53,
                      iterations: int = 10, eps: float = 0.03,
                      interpret: bool = False):
    """Full pyramidal LK for all points in ONE kernel launch.

    ``prev_pyramid``/``next_pyramid``: lists of >= levels+1 images (level 0 first).
    Returns (flow [N, 2] displacement at level 0, ok [N] bool)."""
    n = points.shape[0]
    dims = tuple((int(p.shape[0]), int(p.shape[1]))
                 for p in prev_pyramid[:levels + 1])
    wins = tuple((min(win_h, lh - 8), min(win_w, lw - 8)) for lh, lw in dims)
    prev_pad = [_pad_level(p) for p in prev_pyramid[:levels + 1]]
    next_pad = [_pad_level(p) for p in next_pyramid[:levels + 1]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # points, valid in SMEM
        grid=(n,),
        in_specs=[pl.BlockSpec(img.shape, lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)
                  for img in prev_pad + next_pad],
        out_specs=[
            pl.BlockSpec((n, 2), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    out_g, out_ok = pl.pallas_call(
        partial(_lk_pyramid_kernel, levels=levels, dims=dims, wins=wins,
                iterations=iterations, eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(points.astype(jnp.float32), valid.astype(jnp.int32),
      *prev_pad, *next_pad)
    return out_g, out_ok[:, 0] > 0


@partial(jax.jit, static_argnames=("win_h", "win_w", "iterations", "eps",
                                   "interpret"))
def lk_level_pallas(prev_img, next_img, points, guesses, valid,
                    win_h: int, win_w: int, iterations: int = 10,
                    eps: float = 0.03, interpret: bool = False):
    """One LK pyramid level for all points.  points/guesses [N, 2] at THIS level's
    scale; returns (new_guesses [N, 2], ok [N] bool)."""
    n = points.shape[0]
    lh, lw = prev_img.shape
    # Mosaic dynamic lane rotates need (sublane, lane)-aligned shapes: pad the
    # level images to multiples of (8, 128) (edge padding; clamps use true dims)
    ph = -(-lh // 8) * 8 + 8  # extra sublane slack for aligned-base loads
    pw = -(-lw // 128) * 128
    if True:
        prev_img = jnp.pad(prev_img, ((0, ph - lh), (0, pw - lw)), mode="edge")
        next_img = jnp.pad(next_img, ((0, ph - lh), (0, pw - lw)), mode="edge")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # points, guesses, valid in SMEM
        grid=(n,),
        in_specs=[
            pl.BlockSpec(prev_img.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(next_img.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, 2), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    out_g, out_ok = pl.pallas_call(
        partial(_lk_kernel, win_h=win_h, win_w=win_w, iterations=iterations,
                eps=eps, lh=lh, lw=lw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(points.astype(jnp.float32), guesses.astype(jnp.float32),
      valid.astype(jnp.int32), prev_img, next_img)
    return out_g, out_ok[:, 0] > 0
