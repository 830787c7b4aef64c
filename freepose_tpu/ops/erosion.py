"""Binary morphology: isotropic (disk) erosion with adaptive radius ladder.

Device-side equivalent of skimage.morphology.isotropic_erosion as used for
mask cleanup before pointcloud scale estimation (reference
scale_estimators.py:132-143: erode at radius 8, halving until at least
min_vertices pixels survive). The radius ladder (8, 4, 2, 1, original) is a
static unrolled select — jit-safe, no data-dependent Python control flow.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _disk_kernel(radius: float) -> np.ndarray:
    r = int(np.ceil(radius))
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    return (x * x + y * y <= radius * radius).astype(np.float32)


@partial(jax.jit, static_argnames=("radius",))
def isotropic_erosion(mask: jax.Array, radius: float) -> jax.Array:
    """[H, W] bool erosion by a euclidean disk: a pixel survives iff every
    pixel within `radius` is foreground."""
    if radius <= 0:
        return mask
    kern = jnp.asarray(_disk_kernel(radius))
    inv = (~mask).astype(jnp.float32)[None, :, :, None]
    hits = jax.lax.conv_general_dilated(
        inv,
        kern[:, :, None, None],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    # Zero padding of the inverted mask treats beyond-border as foreground,
    # matching skimage's EDT-based semantics (border pixels survive if no
    # in-image background is within the disk).
    return mask & (hits < 0.5)


@partial(jax.jit, static_argnames=("radius", "min_pixels"))
def adaptive_erosion(mask: jax.Array, radius: int = 8, min_pixels: int = 25) -> jax.Array:
    """Erode at `radius`, halving until > min_pixels survive; fall back to the
    uneroded mask (reference scale_estimators.py:137-143)."""
    result = mask
    ladder = []
    r = float(radius)
    while r >= 1.0:
        ladder.append(r)
        r /= 2.0
    # Evaluate from smallest to largest, keeping the largest radius that
    # leaves enough pixels.
    for r in sorted(ladder):
        eroded = isotropic_erosion(mask, r)
        result = jnp.where(jnp.sum(eroded) > min_pixels, eroded, result)
    return result
