"""Pyramidal Lucas-Kanade optical flow with forward-backward validation.

Replaces cv::calcOpticalFlowPyrLK as used by the reference
(src/features/keypoints/keypoint_detection.cpp:262-361): window = image/12 x image/9
(~53x53 at 640x480), 4 pyramid levels, 10 iterations with eps 0.03, then a backward
track whose round-trip distance gates the match.

TPU design: ALL points advance in lockstep — `vmap` over points, a static loop over
pyramid levels, `lax.fori_loop` over LK iterations; window gathers are batched
bilinear samples.  No data-dependent trip counts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .image import bilinear_sample, build_pyramid, gradients, in_border


def _window_offsets(win_h: int, win_w: int, dtype=jnp.float32):
    ys = jnp.arange(win_h, dtype=dtype) - (win_h - 1) / 2.0
    xs = jnp.arange(win_w, dtype=dtype) - (win_w - 1) / 2.0
    oy, ox = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # [K, 2]


def _lk_level(prev_img, next_img, prev_ix, prev_iy, pt_prev, guess,
              offsets, iterations: int, eps: float):
    """Iterative LK at one pyramid level for a single point.  pt_prev is the point in
    the previous image at this level's scale; guess is the current flow estimate."""
    win_pos = pt_prev[None, :] + offsets  # [K, 2]
    t = bilinear_sample(prev_img, win_pos)
    ix = bilinear_sample(prev_ix, win_pos)
    iy = bilinear_sample(prev_iy, win_pos)

    gxx = jnp.sum(ix * ix)
    gxy = jnp.sum(ix * iy)
    gyy = jnp.sum(iy * iy)
    det = gxx * gyy - gxy * gxy
    ok = det > 1e-6
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)

    def body(_, carry):
        g, done = carry
        j = bilinear_sample(next_img, win_pos + g[None, :])
        diff = t - j
        bx = jnp.sum(ix * diff)
        by = jnp.sum(iy * diff)
        dx = (gyy * bx - gxy * by) * inv_det
        dy = (gxx * by - gxy * bx) * inv_det
        step = jnp.stack([dx, dy])
        new_g = jnp.where(done, g, g + step)
        done = done | (jnp.sum(step * step) < eps * eps)
        return new_g, done

    guess, _ = jax.lax.fori_loop(0, iterations, body,
                                 (guess, jnp.logical_not(ok)))
    return guess, ok


@partial(jax.jit, static_argnames=("levels", "win_h", "win_w", "iterations"))
def lk_track(prev_pyramid, next_pyramid, points, points_valid,
             levels: int = 4, win_h: int = 53, win_w: int = 53,
             iterations: int = 10, eps: float = 0.03):
    """Track ``points`` [N, 2] from the previous to the next image.

    ``prev_pyramid``/``next_pyramid`` are lists from :func:`build_pyramid` (length
    >= levels+1).  Returns (new_points [N, 2], status [N] bool)."""
    offsets = _window_offsets(win_h, win_w, points.dtype)

    grads = [gradients(p) for p in prev_pyramid]

    def track_one(pt, valid):
        scale = 0.5 ** levels
        g = jnp.zeros(2, dtype=pt.dtype)
        ok_all = valid
        for lvl in range(levels, -1, -1):
            prev_img = prev_pyramid[lvl]
            next_img = next_pyramid[lvl]
            ix, iy = grads[lvl]
            pt_l = pt * (0.5 ** lvl)
            g, ok = _lk_level(prev_img, next_img, ix, iy, pt_l, g,
                              offsets, iterations, eps)
            ok_all = ok_all & ok
            if lvl > 0:
                g = g * 2.0
        new_pt = pt + g
        h, w = prev_pyramid[0].shape
        status = ok_all & in_border(new_pt, h, w, margin=1.0) \
            & jnp.all(jnp.isfinite(new_pt))
        return jnp.where(status, new_pt, pt), status

    return jax.vmap(track_one)(points, points_valid)


@partial(jax.jit, static_argnames=("levels", "win_h", "win_w", "iterations"))
def track_forward_backward(prev_pyramid, next_pyramid, points, points_valid,
                           max_roundtrip_px: float = 30.0,
                           levels: int = 4, win_h: int = 53, win_w: int = 53,
                           iterations: int = 10):
    """Forward LK + backward validation (reference: get_keypoints_from_optical_flow,
    keypoint_detection.cpp:262-361): forward track, border filter, backward track,
    reject when the round trip exceeds ``max_roundtrip_px`` (matchSearchRadius).

    Returns (tracked_points [N, 2], status [N] bool) — surviving points keep their
    index, i.e. their map id ("low cost feature association")."""
    fwd, fwd_ok = lk_track(prev_pyramid, next_pyramid, points, points_valid,
                           levels=levels, win_h=win_h, win_w=win_w,
                           iterations=iterations)
    bwd, bwd_ok = lk_track(next_pyramid, prev_pyramid, fwd, fwd_ok,
                           levels=levels, win_h=win_h, win_w=win_w,
                           iterations=iterations)
    roundtrip = jnp.linalg.norm(points - bwd, axis=-1)
    status = fwd_ok & bwd_ok & (roundtrip <= max_roundtrip_px)
    return jnp.where(status[:, None], fwd, points), status
