"""Pinhole camera math: projection, backprojection, bbox z-lifting.

TPU-first versions of the reference's numpy geometry
(/root/reference/src/pipeline/utils.py:122-170,
/root/reference/src/pipeline/refiner_utils.py:92-170): everything is batched,
static-shape, masked instead of boolean-indexed, and jit-safe so it fuses
into the surrounding render/score pipelines.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def project_points(points: jax.Array, k: jax.Array, eps: float = 1e-9) -> jax.Array:
    """[..., N, 3] camera-frame points + [..., 3, 3] intrinsics -> [..., N, 2] pixels."""
    uvw = jnp.einsum("...ij,...nj->...ni", k, points)
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], eps)


def transform_points(points: jax.Array, t: jax.Array) -> jax.Array:
    """[..., N, 3] points through [..., 4, 4] rigid transform."""
    return jnp.einsum("...ij,...nj->...ni", t[..., :3, :3], points) + t[..., None, :3, 3]


def backproject_depth(depth: jax.Array, k: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dense depth map -> pointcloud with validity mask.

    Unlike the reference (utils.py:122-145), which boolean-filters zero-depth
    pixels into a ragged array, we keep the full [H*W, 3] grid plus a mask —
    a static shape the compiler can tile; reductions downstream are masked.

    Returns (points [H*W, 3], valid [H*W] bool).
    """
    h, w = depth.shape
    u = jnp.arange(w, dtype=depth.dtype)
    v = jnp.arange(h, dtype=depth.dtype)
    uu, vv = jnp.meshgrid(u, v)
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    z = depth
    x = (uu - cx) * z / fx
    y = (vv - cy) * z / fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = depth.reshape(-1) > 0
    return pts, valid


def masked_minmax(values: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Min/max of `values` where mask, ignoring masked-out entries."""
    big = jnp.asarray(jnp.finfo(values.dtype).max, values.dtype)
    vmin = jnp.min(jnp.where(mask, values, big))
    vmax = jnp.max(jnp.where(mask, values, -big))
    return vmin, vmax


def z_lift_from_pointcloud(
    bbox: jax.Array,
    points: jax.Array,
    valid: jax.Array,
    k: jax.Array,
    tco_init: jax.Array,
) -> jax.Array:
    """Lift a template pose to metric depth from a detection bbox.

    Matches get_z_from_pointcloud (reference utils.py:148-170): the template
    pointcloud's x/y extent vs the bbox pixel extent gives z; bbox centre
    gives x/y. `points` is a padded [N, 3] cloud with `valid` mask.
    """
    tco = tco_init
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    bb_cx = (bbox[0] + bbox[2]) / 2.0
    bb_cy = (bbox[1] + bbox[3]) / 2.0

    xmin, xmax = masked_minmax(points[:, 0], valid)
    ymin, ymax = masked_minmax(points[:, 1], valid)
    bb_dx = (bbox[2] - bbox[0]) + 1.0
    bb_dy = (bbox[3] - bbox[1]) + 1.0
    z = (fx * (xmax - xmin) / bb_dx + fy * (ymax - ymin) / bb_dy) / 2.0
    # Degenerate (all-masked) cloud: keep the template depth instead of ±inf.
    z = jnp.where(jnp.any(valid), z, tco_init[2, 3])

    x = (bb_cx - cx) * z / fx
    y = (bb_cy - cy) * z / fy
    tco = tco.at[0, 3].set(x)
    tco = tco.at[1, 3].set(y)
    tco = tco.at[2, 3].set(z)
    return tco


def update_k_with_crop(k: jax.Array, bboxes: jax.Array, out_w: int, out_h: int) -> jax.Array:
    """Adjust intrinsics for a crop+resize to (out_h, out_w).

    Vectorized counterpart of refiner_utils.update_K_with_crop
    (reference refiner_utils.py:136-170). bboxes: [N, 4] xyxy.
    """
    crop_w = bboxes[:, 2] - bboxes[:, 0]
    crop_h = bboxes[:, 3] - bboxes[:, 1]
    crop_cx = (bboxes[:, 0] + bboxes[:, 2]) / 2.0
    crop_cy = (bboxes[:, 1] + bboxes[:, 3]) / 2.0

    cx = k[0, 2] + (crop_w - 1.0) / 2.0 - crop_cx
    cy = k[1, 2] + (crop_h - 1.0) / 2.0 - crop_cy
    center_x = (crop_w - 1.0) / 2.0
    center_y = (crop_h - 1.0) / 2.0
    scale_x = out_w / crop_w
    scale_y = out_h / crop_h
    fx = scale_x * k[0, 0]
    fy = scale_y * k[1, 1]
    new_cx = (out_w - 1.0) / 2.0 + scale_x * (cx - center_x)
    new_cy = (out_h - 1.0) / 2.0 + scale_y * (cy - center_y)

    n = bboxes.shape[0]
    new_k = jnp.tile(k, (n, 1, 1))
    new_k = new_k.at[:, 0, 0].set(fx)
    new_k = new_k.at[:, 1, 1].set(fy)
    new_k = new_k.at[:, 0, 2].set(new_cx)
    new_k = new_k.at[:, 1, 2].set(new_cy)
    return new_k


def crop_bbox_around_projection(
    t: jax.Array, points: jax.Array, k: jax.Array, render_w: int, render_h: int, lamb: float = 1.4
) -> jax.Array:
    """Object-centred square-ish crop bbox from projected model points.

    Batched counterpart of refiner_utils.crop_image's bbox computation
    (reference refiner_utils.py:98-123). t: [B, 4, 4] poses, points: [N, 3]
    model points. Returns [B, 4] xyxy bboxes.
    """
    cam_pts = jax.vmap(lambda ti: transform_points(points[None], ti)[0])(t)  # [B, N, 3]
    uv = project_points(cam_pts, k, eps=0.01)  # [B, N, 2]
    bb_min = jnp.min(uv, axis=1)
    bb_max = jnp.max(uv, axis=1)

    center3d = jnp.mean(points, axis=0, keepdims=True)
    cam_center = jax.vmap(lambda ti: transform_points(center3d[None], ti)[0])(t)
    c_uv = project_points(cam_center, k, eps=0.01)[:, 0]  # [B, 2]

    dists = jnp.maximum(jnp.abs(bb_min - c_uv), jnp.abs(bb_max - c_uv))
    xd, yd = dists[:, 0], dists[:, 1]
    r = render_w / render_h
    width = jnp.maximum(xd, yd * r) * 2.0 * lamb
    height = jnp.maximum(xd / r, yd) * 2.0 * lamb
    return jnp.stack(
        [c_uv[:, 0] - width / 2, c_uv[:, 1] - height / 2, c_uv[:, 0] + width / 2, c_uv[:, 1] + height / 2],
        axis=1,
    )


def default_video_intrinsics(w: int, h: int, dtype=jnp.float32) -> jax.Array:
    """Synthetic K for uncalibrated video: f = image diagonal, principal point
    at centre (reference dino_inference_video.py:116-118, video_evaluation.py
    `project`)."""
    f = jnp.sqrt(jnp.asarray(w * w + h * h, dtype))
    return jnp.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1.0]], dtype=dtype)
