"""Bounding-box utilities (xyxy/xywh conversion, IoU, mask->bbox).

Batched jax counterparts of /root/reference/src/utils/bbox_utils.py:59-145
and mask_to_bbox (/root/reference/src/pipeline/utils.py:172-181).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def xyxy_to_xywh(bbox: jax.Array) -> jax.Array:
    """[..., 4] x1y1x2y2 -> xywh (w = x2 - x1, batched convention)."""
    x1, y1, x2, y2 = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def xywh_to_xyxy(bbox: jax.Array) -> jax.Array:
    x, y, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def bbox_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU of xywh boxes, broadcasting over leading dims
    (reference bbox_utils.py:125-145)."""
    ax2, ay2 = a[..., 0] + a[..., 2], a[..., 1] + a[..., 3]
    bx2, by2 = b[..., 0] + b[..., 2], b[..., 1] + b[..., 3]
    tlx = jnp.maximum(a[..., 0], b[..., 0])
    tly = jnp.maximum(a[..., 1], b[..., 1])
    brx = jnp.minimum(ax2, bx2)
    bry = jnp.minimum(ay2, by2)
    w = brx - tlx
    h = bry - tly
    inter = jnp.where((w > 0) & (h > 0), w * h, 0.0)
    union = a[..., 2] * a[..., 3] + b[..., 2] * b[..., 3] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def mask_to_bbox(mask: jax.Array) -> jax.Array:
    """[H, W] bool mask -> [4] xyxy bbox (jit-safe: masked arg-reductions
    instead of np.nonzero; reference utils.py:172-181)."""
    h, w = mask.shape
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    row_any = jnp.any(mask, axis=1)
    col_any = jnp.any(mask, axis=0)
    y_min = jnp.min(jnp.where(row_any, ys, h))
    y_max = jnp.max(jnp.where(row_any, ys, -1))
    x_min = jnp.min(jnp.where(col_any, xs, w))
    x_max = jnp.max(jnp.where(col_any, xs, -1))
    return jnp.stack([x_min, y_min, x_max, y_max])


def extend_and_clip_boxes(boxes: jax.Array, extend: float, w: int, h: int) -> jax.Array:
    """Grow xyxy boxes by `extend` * size on every side, clipped to the image
    (reference bbox_utils.py:22-28)."""
    bw = boxes[..., 2] - boxes[..., 0]
    bh = boxes[..., 3] - boxes[..., 1]
    x1 = jnp.maximum(0.0, boxes[..., 0] - extend * bw)
    x2 = jnp.minimum(float(w), boxes[..., 2] + extend * bw)
    y1 = jnp.maximum(0.0, boxes[..., 1] - extend * bh)
    y2 = jnp.minimum(float(h), boxes[..., 3] + extend * bh)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nms_xyxy(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy non-maximum suppression over xyxy boxes -> kept indices in
    descending-score order (torchvision.ops.nms semantics, used by the SAM2
    automatic mask generator at reference automatic_mask_generator.py:261-267).

    Host-side numpy: candidate counts here are data-dependent and small
    (hundreds), so this is control-flow, not a hot op — the same split as
    EPnP (pipeline/pnp.py). The O(N²) IoU matrix is vectorized."""
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    scores = np.asarray(scores, np.float32).reshape(-1)
    if boxes.shape[0] == 0:
        return np.zeros((0,), np.int64)
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    iw = np.maximum(
        np.minimum(x2[:, None], x2[None]) - np.maximum(x1[:, None], x1[None]), 0
    )
    ih = np.maximum(
        np.minimum(y2[:, None], y2[None]) - np.maximum(y1[:, None], y1[None]), 0
    )
    inter = iw * ih
    union = areas[:, None] + areas[None] - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
    order = np.argsort(-scores, kind="stable")
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        alive &= iou[i] <= iou_threshold
        alive[i] = False
    return np.asarray(keep, np.int64)
