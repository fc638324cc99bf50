"""Closed-form symmetric 3x3 eigendecomposition (batched).

``jnp.linalg.eigh`` on [N, 3, 3] lowers to an iterative QR solver — needlessly slow
for the CAPE cell fits (768 cells/frame).  This is the analytic trigonometric method
(Smith 1961): eigenvalues from one acos, the wanted eigenvector from cross products of
(A - lambda I) rows.  Used by the plane/cylinder fitting paths.
"""

from __future__ import annotations

import jax.numpy as jnp


def sym_eig3(a):
    """Eigenvalues (ascending) of symmetric [..., 3, 3] matrices, closed form."""
    a00, a11, a22 = a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]
    a01, a02, a12 = a[..., 0, 1], a[..., 0, 2], a[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detb = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo

    isotropic = p2 < 1e-20
    e_lo = jnp.where(isotropic, q, e_lo)
    e_mid = jnp.where(isotropic, q, e_mid)
    e_hi = jnp.where(isotropic, q, e_hi)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def eigenvector_for(a, lam):
    """Unit eigenvector of symmetric [..., 3, 3] ``a`` for eigenvalue ``lam``:
    the cross product of the two most independent rows of (a - lam I).

    The matrix is norm-scaled first: squared cross-product norms of raw
    mm^2-scale moment matrices overflow f32 (entries ~1e10 -> norms ~1e42)."""
    scale = jnp.maximum(
        jnp.max(jnp.abs(a), axis=(-2, -1), keepdims=True), 1e-30)
    a = a / scale
    lam = lam / scale[..., 0, 0]
    eye = jnp.eye(3, dtype=a.dtype)
    m = a - lam[..., None, None] * eye
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    v = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32)
                            .repeat(3, axis=-1), axis=-2)[..., 0, :]
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # degenerate (repeated eigenvalue): fall back to a fixed axis
    fallback = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], a.dtype), v.shape)
    return jnp.where(norm > 1e-12, v / jnp.maximum(norm, 1e-12), fallback)


def sym_eig3_smallest(a):
    """(eigenvalues ascending [..., 3], unit eigenvector of the smallest [..., 3])."""
    vals = sym_eig3(a)
    vec = eigenvector_for(a, vals[..., 0])
    return vals, vec
