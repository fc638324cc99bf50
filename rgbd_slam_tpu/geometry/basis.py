"""Cartesian <-> spherical basis changes with Jacobians.

Parity with reference src/coordinates/basis_changes.cpp.  Spherical is
``(p, theta, phi)`` with theta the polar angle from +z and phi = atan2(y, x).
Batched over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def spherical_to_cartesian(sph):
    """(p, theta, phi) -> (x, y, z) (reference: Cartesian::from, basis_changes.cpp:5-11)."""
    p, theta, phi = sph[..., 0], sph[..., 1], sph[..., 2]
    st = jnp.sin(theta)
    return jnp.stack([p * st * jnp.cos(phi), p * st * jnp.sin(phi), p * jnp.cos(theta)], axis=-1)


def spherical_to_cartesian_jacobian(sph):
    """3x3 Jacobian d(x,y,z)/d(p,theta,phi) (reference: basis_changes.cpp:13-29)."""
    p, theta, phi = sph[..., 0], sph[..., 1], sph[..., 2]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    t1 = sp * st
    t2 = cp * st
    zero = jnp.zeros_like(p)
    return jnp.stack(
        [
            jnp.stack([t2, p * ct * cp, -p * t1], axis=-1),
            jnp.stack([t1, p * ct * sp, p * t2], axis=-1),
            jnp.stack([ct, -p * st, zero], axis=-1),
        ],
        axis=-2,
    )


def cartesian_to_spherical(xyz):
    """(x,y,z) -> (p, theta, phi) (reference: Spherical::from, basis_changes.cpp:31-34)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    p = jnp.linalg.norm(xyz, axis=-1)
    theta = jnp.arctan2(jnp.sqrt(x * x + y * y), z)
    phi = jnp.arctan2(y, x)
    return jnp.stack([p, theta, phi], axis=-1)


def cartesian_to_spherical_jacobian(xyz):
    """3x3 Jacobian d(p,theta,phi)/d(x,y,z) (reference: basis_changes.cpp:36-62).
    Singular on the z axis (x=y=0), guarded with an epsilon like all downstream users."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    t1 = xx + yy + zz
    t2 = jnp.maximum(xx + yy, 1e-12)
    st1 = jnp.sqrt(t1)
    st2 = jnp.sqrt(t2)
    inv12 = 1.0 / (st2 * t1)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([x / st1, y / st1, z / st1], axis=-1),
            jnp.stack([x * z * inv12, y * z * inv12, -st2 / t1], axis=-1),
            jnp.stack([-y / t2, x / t2, zero], axis=-1),
        ],
        axis=-2,
    )
