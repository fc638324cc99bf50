"""BRIEF-256 binary descriptors, batched over keypoints.

The reference uses OpenCV's BriefDescriptorExtractor (32-byte descriptors over a
box-smoothed image; src/features/keypoints/keypoint_detection.cpp:67,236).  Here the
test-pair pattern is a fixed deterministic Gaussian pattern (BRIEF paper G II layout),
the smoothing is the same 9x9 box sum, and all keypoints' 256 point-pair tests run as
one batched gather -> compare -> bit-pack, producing [N, 8] uint32 descriptors whose
Hamming distances use ``lax.population_count`` on the MXU-friendly XOR matrix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .image import bilinear_sample, box_filter

PATCH_SIZE = 31
N_BITS = 256
N_WORDS = N_BITS // 32


def _make_pattern(seed: int = 12345):
    """Deterministic BRIEF sampling pattern: isotropic Gaussian pairs with
    sigma = patch/5, clamped to the patch (BRIEF paper; OpenCV uses a fixed
    precomputed pattern of the same family)."""
    rng = np.random.default_rng(seed)
    sigma = PATCH_SIZE / 5.0
    half = PATCH_SIZE // 2
    a = np.clip(rng.normal(0.0, sigma, (N_BITS, 2)), -half, half)
    b = np.clip(rng.normal(0.0, sigma, (N_BITS, 2)), -half, half)
    return a.astype(np.float32), b.astype(np.float32)

_PATTERN_A, _PATTERN_B = _make_pattern()


@partial(jax.jit, static_argnames=())
def compute_brief(img, xy, valid):
    """Descriptors for keypoints ``xy`` [N, 2] on image [H, W].

    Returns (descriptors [N, 8] uint32, desc_valid [N] bool) — points whose patch
    leaves the image are invalidated (OpenCV removes them,
    keypoint_detection.cpp:232-240)."""
    h, w = img.shape
    smoothed = box_filter(img, 9)

    pa = jnp.asarray(_PATTERN_A)  # [256, 2]
    pb = jnp.asarray(_PATTERN_B)

    pos_a = xy[:, None, :] + pa[None]  # [N, 256, 2]
    pos_b = xy[:, None, :] + pb[None]
    va = bilinear_sample(smoothed, pos_a)
    vb = bilinear_sample(smoothed, pos_b)
    bits = (va < vb)  # [N, 256]

    # pack 256 bits into 8 uint32 words
    bits_u = bits.astype(jnp.uint32).reshape(xy.shape[0], N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc = jnp.sum(bits_u << shifts[None, None, :], axis=-1).astype(jnp.uint32)

    half = PATCH_SIZE // 2
    inside = ((xy[:, 0] >= half) & (xy[:, 0] < w - half)
              & (xy[:, 1] >= half) & (xy[:, 1] < h - half))
    return desc, valid & inside


def hamming_distance_matrix(desc_a, desc_b):
    """Pairwise Hamming distances [A, B] between uint32-packed descriptor sets
    [A, 8] and [B, 8] (replaces the reference's BFMatcher Hamming kNN,
    src/features/keypoints/keypoint_handler.cpp:234-282)."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
