"""Pallas TPU kernel for pyramidal Lucas-Kanade iteration.

The XLA formulation of LK (ops/optical_flow.py) runs ~100 sequential HLO steps of
vmapped dynamic slices — far from roofline on TPU.  This kernel keeps BOTH pyramid
level images resident in VMEM and runs the entire per-point iteration loop inside one
program: one grid step per point; per-point coordinates ride in SMEM via scalar
prefetch; window slices and reductions never leave VMEM.

Used for the per-level solve; the pyramid loop and forward-backward logic stay in
optical_flow.py (same API).
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
