"""Masked pointcloud ops: scale estimation, outlier rejection, SVD alignment.

TPU-first equivalents of the reference's ragged-numpy pointcloud pipeline
(/root/reference/src/pipeline/estimators/scale_estimators.py:117-177 and
/root/reference/src/pipeline/utils.py:86-120). Everything here keeps static
[H*W]-shaped buffers with validity masks so that whole per-proposal scale
estimation jits as one program, batched over proposals with vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from freepose_tpu.geometry.camera import masked_minmax


def masked_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Median over valid entries of a padded 1-D array (jit-safe).

    Sorts invalid entries to +inf and picks the middle valid index; for even
    counts averages the two central elements (numpy 'linear' convention).
    """
    n = values.shape[0]
    big = jnp.asarray(jnp.finfo(values.dtype).max, values.dtype)
    sorted_vals = jnp.sort(jnp.where(mask, values, big))
    cnt = jnp.sum(mask)
    hi = jnp.clip((cnt - 1) // 2 + (cnt - 1) % 2, 0, n - 1)
    lo = jnp.clip((cnt - 1) // 2, 0, n - 1)
    return (sorted_vals[lo] + sorted_vals[hi]) / 2.0


def masked_mean(values: jax.Array, mask: jax.Array, axis=0) -> jax.Array:
    m = mask if values.ndim == mask.ndim else mask[..., None]
    s = jnp.sum(jnp.where(m, values, 0.0), axis=axis)
    return s / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


def masked_std(values: jax.Array, mask: jax.Array) -> jax.Array:
    mu = masked_mean(values, mask)
    var = masked_mean((values - mu) ** 2, mask)
    return jnp.sqrt(var)


def reject_depth_outliers(
    z: jax.Array, valid: jax.Array, std_factor: float = 1.5, min_vertices: int = 25
) -> jax.Array:
    """Keep depths within std_factor * std of the median, but never fewer than
    min_vertices (by distance-to-median rank). Masked counterpart of the
    reference's sort-and-cut (scale_estimators.py:149-159).
    """
    med = masked_median(z, valid)
    std = masked_std(z, valid)
    dist = jnp.abs(z - med)
    # <= so that a zero-variance (flat) cloud keeps every point instead of
    # degenerating to the forced minimum.
    inlier = valid & (dist <= std * std_factor)
    # Guarantee min_vertices: rank valid points by distance and force-keep the
    # closest ones.
    big = jnp.asarray(jnp.finfo(z.dtype).max, z.dtype)
    rank = jnp.argsort(jnp.argsort(jnp.where(valid, dist, big)))
    forced = valid & (rank < min_vertices)
    return inlier | forced


def svd_align(points: jax.Array, valid: jax.Array) -> jax.Array:
    """Rotate a padded pointcloud into its principal axes
    (reference scale_estimators.py:124-129). Invalid rows pass through the
    same rotation (harmless — they stay masked)."""
    mu = masked_mean(points, valid)
    x = jnp.where(valid[:, None], points - mu, 0.0)
    cov = x.T @ x
    _, _, vt = jnp.linalg.svd(cov)
    return points @ vt.T


def bbox_half_extent(points: jax.Array, valid: jax.Array) -> jax.Array:
    """Half of the largest axis-aligned extent — the 'scale' of a cloud
    (reference scale_estimators.py:117-122)."""
    xmin, xmax = masked_minmax(points[:, 0], valid)
    ymin, ymax = masked_minmax(points[:, 1], valid)
    zmin, zmax = masked_minmax(points[:, 2], valid)
    return jnp.maximum(jnp.maximum(xmax - xmin, ymax - ymin), zmax - zmin) / 2.0


def pointcloud_from_mask(
    depth: jax.Array,
    k: jax.Array,
    mask: jax.Array,
    std_factor: float = 1.5,
    min_vertices: int = 25,
    svd: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Masked backprojection + outlier rejection (+ optional SVD alignment).

    Returns ([H*W, 3] padded points, [H*W] valid). The caller is responsible
    for largest-connected-component + erosion preprocessing of `mask` (see
    freepose_tpu.ops.connected_components / erosion), mirroring
    generate_pointcloud (reference scale_estimators.py:132-177).
    """
    z = depth.reshape(-1)
    valid = mask.reshape(-1) & (z > 0)
    valid = reject_depth_outliers(z, valid, std_factor, min_vertices)
    pts = backproject_flat(depth, k)
    if svd:
        pts = svd_align(pts, valid)
    return pts, valid


def backproject_flat(depth: jax.Array, k: jax.Array) -> jax.Array:
    """Dense pinhole backprojection of [H, W] depth -> [H*W, 3] points."""
    h, w = depth.shape
    uu, vv = jnp.meshgrid(jnp.arange(w, dtype=depth.dtype), jnp.arange(h, dtype=depth.dtype))
    z = depth.reshape(-1)
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    x = (uu.reshape(-1) - cx) * z / fx
    y = (vv.reshape(-1) - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def colored_point_cloud(
    rgb: jax.Array,  # [H, W, 3] in [0, 255] or [0, 1]
    depth: jax.Array,  # [H, W] metres
    k: jax.Array,
    mask: jax.Array,  # [H, W] bool
    erosion_radius: int = 1,
    std_factor: float = 3.0,
    align: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """[H*W, 6] padded XYZRGB cloud + validity, from the largest connected
    mask component after isotropic erosion, with median±std·std_factor depth
    outlier rejection and optional SVD principal-axis alignment — the
    reference's colored debug cloud, generate_point_cloud
    (src/pipeline/utils.py:86-120), as a masked static-shape program."""
    from freepose_tpu.ops.connected_components import largest_component
    from freepose_tpu.ops.erosion import isotropic_erosion

    m = isotropic_erosion(largest_component(mask), radius=erosion_radius)
    z = depth.reshape(-1)
    valid = m.reshape(-1) & (z > 0)
    # Strict median±std·k cut, no forced minimum (reference utils.py:111-112
    # semantics — reject_depth_outliers adds a min_vertices floor it lacks).
    med = masked_median(z, valid)
    std = masked_std(z, valid)
    valid = valid & (jnp.abs(z - med) < std * std_factor)

    pts = backproject_flat(depth, k)
    if align:
        pts = svd_align(pts, valid)
    colors = rgb.reshape(-1, 3).astype(jnp.float32)
    colors = jnp.where(jnp.max(colors) > 1.5, colors / 255.0, colors)
    return jnp.concatenate([pts, colors], axis=-1), valid
