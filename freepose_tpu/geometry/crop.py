"""Crop-resize-pad: the canonical proposal preprocessing, as one fused gather.

The reference implements this as a Python loop of per-box dynamic crops,
two-stage nearest interpolation and padding (CropResizePad,
/root/reference/src/utils/bbox_utils.py:9-56) — dynamic shapes that cannot
compile. Here the whole thing is a single static-shape batched gather: for
every output pixel we compute its source pixel analytically (bbox extend →
isotropic scale so max side = target → centre in a target×target canvas,
nearest sampling, zero padding), so N proposals process as one jitted program
on TPU regardless of box sizes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from freepose_tpu.geometry.boxes import extend_and_clip_boxes


@partial(jax.jit, static_argnames=("target", "extend"))
def crop_resize_pad(images: jax.Array, boxes: jax.Array, target: int, extend: float = 0.0) -> jax.Array:
    """Crop each box, scale isotropically to fit `target`, centre with zero pad.

    Args:
      images: [N, C, H, W] float images (one per box).
      boxes: [N, 4] xyxy (int or float; truncated to int like the reference).
      target: output side length.
      extend: fractional bbox extension per side before cropping.

    Returns: [N, C, target, target].
    """
    n, c, h, w = images.shape
    fboxes = boxes.astype(jnp.float32)
    if extend:
        fboxes = extend_and_clip_boxes(fboxes, extend, w, h)
    iboxes = jnp.floor(fboxes).astype(jnp.int32)

    def one(img: jax.Array, box: jax.Array) -> jax.Array:
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        bw = jnp.maximum(x2 - x1, 1)
        bh = jnp.maximum(y2 - y1, 1)
        maxdim = jnp.maximum(bw, bh)
        scale = target / maxdim.astype(jnp.float32)
        out_h = jnp.floor(bh * scale).astype(jnp.int32)
        out_w = jnp.floor(bw * scale).astype(jnp.int32)
        pad_t = jnp.maximum((target - out_h) // 2, 0)
        pad_l = jnp.maximum((target - out_w) // 2, 0)

        oi = jnp.arange(target, dtype=jnp.int32)
        ci = oi - pad_t  # row within the resized crop
        cj = oi - pad_l
        # Nearest-neighbour source index: floor(dst / scale) with the
        # isotropic scale target/maxdim, computed exactly in integers.
        si = jnp.clip((ci * maxdim) // target, 0, jnp.maximum(bh - 1, 0))
        sj = jnp.clip((cj * maxdim) // target, 0, jnp.maximum(bw - 1, 0))
        yi = jnp.clip(y1 + si, 0, h - 1)
        xj = jnp.clip(x1 + sj, 0, w - 1)
        valid = ((ci >= 0) & (ci < out_h))[:, None] & ((cj >= 0) & (cj < out_w))[None, :]

        gathered = img[:, yi, :][:, :, xj]  # [C, target, target]
        return jnp.where(valid[None], gathered, 0.0)

    return jax.vmap(one)(images, iboxes)


@partial(jax.jit, static_argnames=("target", "extend"))
def crop_resize_pad_shared(image: jax.Array, boxes: jax.Array, target: int, extend: float = 0.0) -> jax.Array:
    """crop_resize_pad of N boxes out of ONE shared [C, H, W] image.

    Avoids materializing the N-fold image repeat the reference does
    (Proposals.extract_proposals, reference utils.py:34-35) — the gather reads
    the single image N times straight out of HBM.
    """
    c, h, w = image.shape
    return crop_resize_pad(jnp.broadcast_to(image, (boxes.shape[0], c, h, w)), boxes, target, extend)
