"""Resampling ops: area/bilinear resize, ROI-align, masked FFA pooling.

Device-side equivalents of the reference's cv2/torch resampling calls:
cv2.INTER_AREA mask downsampling for FFA pooling
(scripts/extract_proposals_ground.py:129), F.interpolate bilinear score masks
(online_pose_estimator.py:73), torchvision roi_align crops
(refiner_utils.py:127-132). All are batched gathers with static shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def resize_area(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Area-averaging resize of [..., H, W] (cv2.INTER_AREA equivalent for
    downsampling)."""
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = out_hw
    img = img.astype(jnp.float32)
    if h % oh == 0 and w % ow == 0:
        # Exact box average for integer downsampling factors (the hot case:
        # 420-px proposal masks -> 30×30 FFA grid is exactly 14×).
        fh, fw = h // oh, w // ow
        r = img.reshape(img.shape[:-2] + (oh, fh, ow, fw))
        return r.mean(axis=(-3, -1))
    # General case: antialiased linear resize integrates over source boxes,
    # closely matching INTER_AREA.
    return jax.image.resize(img, img.shape[:-2] + (oh, ow), method="linear", antialias=True)


def _linear_resize_matrix(n_in: int, n_out: int, align_corners: bool) -> jax.Array:
    """[n_out, n_in] interpolation matrix for 1-D linear resampling (2
    non-zeros per row). Resize-as-matmul keeps the op on the MXU; the
    equivalent per-pixel formulation gathers along the lane dimension, which
    is the slow path on TPU (measured 96 -> ~1 ms/frame for the SAM2 video
    mask upsample at 1024² -> 720×1280)."""
    if align_corners:
        s = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / max(n_out - 1, 1))
    else:
        # torch bilinear: src = (dst + 0.5) * (in/out) - 0.5
        s = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
    i0 = jnp.clip(jnp.floor(s), 0, n_in - 1)
    i1 = jnp.clip(i0 + 1, 0, n_in - 1)
    wgt = jnp.clip(s - i0, 0.0, 1.0)
    cols = jnp.arange(n_in, dtype=jnp.int32)[None, :]
    m = (cols == i0.astype(jnp.int32)[:, None]) * (1.0 - wgt)[:, None]
    m = m + (cols == i1.astype(jnp.int32)[:, None]) * wgt[:, None]
    return m.astype(jnp.float32)


def _resize_linear_mm(img: jax.Array, out_hw: tuple[int, int], align_corners: bool) -> jax.Array:
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = out_hw
    img_f = img.astype(jnp.float32)
    if (oh, ow) == (h, w):
        return img_f
    # Separable: rows then columns, each a dense matmul with the 2-sparse
    # interpolation matrix (identical sums — every other column is zero).
    # precision=highest keeps f32 products exact enough that `> 0` mask
    # thresholds agree with the per-pixel formulation.
    if oh != h:
        ry = _linear_resize_matrix(h, oh, align_corners)
        img_f = jnp.einsum("ah,...hw->...aw", ry, img_f, precision="highest")
    if ow != w:
        rx = _linear_resize_matrix(w, ow, align_corners)
        img_f = jnp.einsum("...hw,bw->...hb", img_f, rx, precision="highest")
    return img_f


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of [..., H, W] matching torch F.interpolate
    (align_corners=False, no antialias). Runs as two MXU matmuls."""
    return _resize_linear_mm(img, out_hw, align_corners=False)


def resize_bilinear_ac(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of [..., H, W] matching torch F.interpolate with
    align_corners=True (corner samples map to corners; used by the DPT-style
    fusion upsample and the ZoeDepth bin interpolations). MXU matmuls."""
    return _resize_linear_mm(img, out_hw, align_corners=True)


@partial(jax.jit, static_argnames=("grid",))
def ffa_pool(patch_feats: jax.Array, masks: jax.Array, grid: int = 30) -> jax.Array:
    """Foreground-feature-averaging: masked mean of patch tokens.

    patch_feats: [N, grid*grid, D]; masks: [N, H, W] bool proposal masks.
    Mirrors the reference FFA (extract_proposals_ground.py:125-134): masks are
    area-downsampled to the patch grid, thresholded >0, and the masked mean of
    patch features is L2-normalized. Empty downsampled masks fall back to the
    unmasked mean instead of NaN.
    """
    n = patch_feats.shape[0]
    m = resize_area(masks.astype(jnp.float32), (grid, grid)) > 0
    m = m.reshape(n, grid * grid, 1).astype(patch_feats.dtype)
    cnt = jnp.sum(m, axis=1)
    mean_masked = jnp.sum(patch_feats * m, axis=1) / jnp.maximum(cnt, 1.0)
    mean_all = jnp.mean(patch_feats, axis=1)
    feats = jnp.where(cnt > 0, mean_masked, mean_all)
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)


@partial(jax.jit, static_argnames=("out_h", "out_w", "sampling_ratio"))
def roi_align(
    image: jax.Array,  # [C, H, W]
    boxes: jax.Array,  # [N, 4] xyxy (float, can exceed image bounds)
    out_h: int,
    out_w: int,
    sampling_ratio: int = 2,
) -> jax.Array:
    """torchvision-style ROI align (aligned=False) -> [N, C, out_h, out_w].

    TPU-native formulation: the s×s bilinear tap grid of an axis-aligned box
    is an outer product over y and x, so the resample factorizes EXACTLY into
    two dense weight matmuls per box (MXU) — per-axis weight w[o, i] =
    mean over taps of valid·tri(i − clip(coord)), where tri is the bilinear
    hat and clipping reproduces the edge-tap semantics. The direct form
    (4·s²·out² arbitrary-index taps, reference torchvision roi_align at
    refiner_utils.py:127-132) lowers to scalar gathers on TPU.
    """
    c, h, w = image.shape
    s = sampling_ratio

    def axis_weights(lo, size, n_out, n_src):
        i = jnp.arange(n_out, dtype=jnp.float32)
        t = jnp.arange(s, dtype=jnp.float32)
        coords = lo + (i[:, None] + (t[None, :] + 0.5) / s) * (size / n_out)  # [o, s]
        valid = (coords > -1.0) & (coords < n_src)  # torchvision zero-padding
        cc = jnp.clip(coords, 0.0, n_src - 1)
        src = jnp.arange(n_src, dtype=jnp.float32)
        tri = jnp.maximum(0.0, 1.0 - jnp.abs(src[None, None, :] - cc[..., None]))
        return jnp.mean(tri * valid[..., None], axis=1)  # [o, n_src]

    def one_box(box):
        x1, y1, x2, y2 = box
        wy = axis_weights(y1, jnp.maximum(y2 - y1, 1e-6), out_h, h)  # [oh, H]
        wx = axis_weights(x1, jnp.maximum(x2 - x1, 1e-6), out_w, w)  # [ow, W]
        return jnp.einsum(
            "oi,cij,pj->cop", wy, image, wx, preferred_element_type=jnp.float32
        )

    return jax.vmap(one_box)(boxes.astype(jnp.float32))


def _cubic_kernel(t: jax.Array, a: float = -0.75) -> jax.Array:
    """Keys cubic convolution kernel (torch's bicubic uses a = -0.75)."""
    at = jnp.abs(t)
    at2, at3 = at * at, at * at * at
    w1 = (a + 2) * at3 - (a + 3) * at2 + 1.0
    w2 = a * at3 - 5 * a * at2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1.0, w1, jnp.where(at < 2.0, w2, 0.0))


def _bicubic_axis_weights(in_size: int, out_size: int):
    """Sample positions and 4-tap weights for one axis (align_corners=False,
    no antialias — matching torch F.interpolate bicubic upsampling)."""
    scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    src = (dst + 0.5) * scale - 0.5
    base = jnp.floor(src).astype(jnp.int32)
    frac = src - base
    taps = jnp.arange(-1, 3)
    idx = jnp.clip(base[:, None] + taps[None, :], 0, in_size - 1)  # [out, 4]
    w = _cubic_kernel(frac[:, None] - taps[None, :].astype(jnp.float32))  # [out, 4]
    return idx, w


def _bicubic_axis_matrix(in_size: int, out_size: int) -> jax.Array:
    """Dense [out, in] interpolation matrix with the 4-tap bicubic weights
    scattered into rows (trace-time numpy — static shapes). Separable resize
    then lowers to two MXU matmuls instead of gathers, which are scalar
    loads on TPU (the gather form profiled ~1 ms per SAM2 trunk forward on
    the 7×7 -> 256² positional-embedding upsample)."""
    import numpy as np

    # Pure numpy mirror of _bicubic_axis_weights (shapes are static, and this
    # may run inside a jit trace where jnp values are tracers).
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float32)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int32)
    frac = src - base
    taps = np.arange(-1, 3)
    yi = np.clip(base[:, None] + taps[None, :], 0, in_size - 1)  # [out, 4]
    t = np.abs(frac[:, None] - taps[None, :].astype(np.float32))
    a = -0.75  # torch bicubic coefficient
    yw = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
    ).astype(np.float32)
    mat = np.zeros((out_size, in_size), np.float32)
    np.add.at(mat, (np.repeat(np.arange(out_size), 4), yi.reshape(-1)), yw.reshape(-1))
    return jnp.asarray(mat)


def resize_bicubic_torch(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bicubic resize of [..., H, W] matching torch F.interpolate
    (mode='bicubic', align_corners=False, antialias=False). Used for the
    windowed positional-embedding interpolation in the SAM2 Hiera trunk
    (reference hieradet.py:265-273), where sub-1e-3 parity matters."""
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = out_hw
    wy = _bicubic_axis_matrix(h, oh)  # [oh, h]
    wx = _bicubic_axis_matrix(w, ow)  # [ow, w]
    img_f = img.astype(jnp.float32)
    rows = jnp.einsum("oh,...hw->...ow", wy, img_f)
    return jnp.einsum("pw,...ow->...op", wx, rows)
