"""Automatic-mask-generation utilities (SAM2 AMG toolbox).

TPU-native counterparts of the vendored helpers (reference
segment-anything-2/sam2/utils/amg.py:158-340): point-prompt grids and
multi-layer crop boxes for automatic mask generation, stability scores, and
the batched mask→box used throughout the SAM2 predictors. The RLE codec half
of the reference file lives in freepose_tpu.io.rle.
"""
from __future__ import annotations

import math
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np


def build_point_grid(n_per_side: int) -> np.ndarray:
    """[n², 2] points evenly spaced in [0,1]² (reference amg.py:181-188)."""
    offset = 1 / (2 * n_per_side)
    side = np.linspace(offset, 1 - offset, n_per_side)
    xs = np.tile(side[None, :], (n_per_side, 1))
    ys = np.tile(side[:, None], (1, n_per_side))
    return np.stack([xs, ys], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(n_per_side: int, n_layers: int, scale_per_layer: int) -> list[np.ndarray]:
    """Per-crop-layer point grids (reference amg.py:191-199)."""
    return [
        build_point_grid(int(n_per_side / (scale_per_layer**i)))
        for i in range(n_layers + 1)
    ]


def generate_crop_boxes(
    im_size: tuple[int, int], n_layers: int, overlap_ratio: float
) -> tuple[list[list[int]], list[int]]:
    """Overlapping xyxy crop boxes per layer, (2^i)² boxes at layer i
    (reference amg.py:202-237); layer 0 is the full image."""
    crop_boxes, layer_idxs = [[0, 0, im_size[1], im_size[0]]], [0]
    im_h, im_w = im_size
    short_side = min(im_h, im_w)

    def crop_len(orig, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig) / n_crops))

    for i_layer in range(n_layers):
        n_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_side))
        cw, ch = crop_len(im_w, n_side, overlap), crop_len(im_h, n_side, overlap)
        x0s = [int((cw - overlap) * i) for i in range(n_side)]
        y0s = [int((ch - overlap) * i) for i in range(n_side)]
        for x0, y0 in product(x0s, y0s):
            crop_boxes.append([x0, y0, min(x0 + cw, im_w), min(y0 + ch, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def uncrop_boxes_xyxy(boxes: jax.Array, crop_box: list[int]) -> jax.Array:
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + jnp.asarray([x0, y0, x0, y0], boxes.dtype)


def uncrop_points(points: jax.Array, crop_box: list[int]) -> jax.Array:
    return points + jnp.asarray([crop_box[0], crop_box[1]], points.dtype)


@jax.jit
def calculate_stability_score(
    masks: jax.Array, mask_threshold: float = 0.0, threshold_offset: float = 1.0
) -> jax.Array:
    """IoU between the high- and low-thresholded binarizations of the mask
    logits (reference amg.py:158-178); [..., H, W] -> [...]."""
    hi = (masks > (mask_threshold + threshold_offset)).sum((-2, -1)).astype(jnp.float32)
    lo = (masks > (mask_threshold - threshold_offset)).sum((-2, -1)).astype(jnp.float32)
    return hi / jnp.maximum(lo, 1e-9)


@jax.jit
def batched_mask_to_box(masks: jax.Array) -> jax.Array:
    """xyxy boxes around bool masks; empty masks -> [0,0,0,0]
    (reference amg.py:305-340). [..., H, W] -> [..., 4]."""
    h, w = masks.shape[-2], masks.shape[-1]
    m = masks.astype(jnp.int32)
    in_h = m.max(-1)  # [..., H]
    hc = in_h * jnp.arange(h)
    bottom = hc.max(-1)
    top = (hc + h * (1 - in_h)).min(-1)
    in_w = m.max(-2)  # [..., W]
    wc = in_w * jnp.arange(w)
    right = wc.max(-1)
    left = (wc + w * (1 - in_w)).min(-1)
    empty = (right < left) | (bottom < top)
    out = jnp.stack([left, top, right, bottom], axis=-1)
    return jnp.where(empty[..., None], 0, out)


def is_box_near_crop_edge(
    boxes: np.ndarray, crop_box: list[int], orig_box: list[int], atol: float = 20.0
) -> np.ndarray:
    """True for xyxy boxes near the crop edge but not near the original image
    edge (reference amg.py:240-254; such masks are artifacts of cropping)."""
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    b = np.asarray(boxes, np.float32) + np.asarray(
        [crop_box[0], crop_box[1], crop_box[0], crop_box[1]], np.float32
    )
    near_crop = np.isclose(b, crop[None], atol=atol, rtol=0)
    near_image = np.isclose(b, orig[None], atol=atol, rtol=0)
    return np.any(near_crop & ~near_image, axis=1)
