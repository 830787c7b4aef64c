"""Feature / mask visualization helpers.

TPU-native counterpart of the reference's visual-observability utilities
(reference src/pipeline/refiner_utils.py:63-89 `show_feats`): PCA of DINOv2
patch features to an RGB map, nearest-neighbour upscale to pixel resolution,
and a side-by-side panel (image | features | mask | masked features). The
PCA runs as one jittable SVD on device instead of sklearn on host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def pca_rgb(feats: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Project [H, W, C] features onto their top-3 principal components and
    min-max normalize each channel to [0, 1] (reference refiner_utils.py:65-67).

    With `mask` [H, W] bool, the PCA basis is fit on masked-in features only
    and masked-out pixels render black (reference refiner_utils.py:79-84).
    """
    h, w, c = feats.shape
    x = feats.reshape(-1, c).astype(jnp.float32)
    if mask is not None:
        m = mask.reshape(-1, 1).astype(jnp.float32)
        n = jnp.maximum(m.sum(), 1.0)
        mean = (x * m).sum(0) / n
        xc = (x - mean) * m
    else:
        xc = x - x.mean(0)
    # Top-3 right singular vectors of the centered data = PCA basis.
    _, _, vt = jnp.linalg.svd(xc, full_matrices=False)
    proj = xc @ vt[:3].T  # [H*W, 3]
    lo = proj.min(0, keepdims=True)
    hi = proj.max(0, keepdims=True)
    rgb = (proj - lo) / jnp.maximum(hi - lo, 1e-12)
    if mask is not None:
        rgb = rgb * mask.reshape(-1, 1)
    return rgb.reshape(h, w, 3)


def nearest_upscale(img: np.ndarray, factor: int) -> np.ndarray:
    """[H, W, ...] -> [H*f, W*f, ...] by pixel replication (the reference's
    Image.Resampling.NEAREST at patch stride, refiner_utils.py:69)."""
    return np.repeat(np.repeat(np.asarray(img), factor, axis=0), factor, axis=1)


def feature_panel(
    image: np.ndarray,
    feats: np.ndarray,
    mask: np.ndarray | None = None,
    patch: int = 14,
) -> np.ndarray:
    """Horizontal uint8 panel: [image | PCA(feats) | mask | PCA(masked feats)]
    (reference refiner_utils.py:63-89). `image` is [H, W, 3] uint8 at patch
    resolution × `patch`; `feats` is the [h, w, C] patch-feature grid."""
    h, w = feats.shape[:2]
    panels = [np.asarray(image, np.uint8)]
    rgb = np.asarray(pca_rgb(jnp.asarray(feats)))
    panels.append(nearest_upscale((rgb * 255).astype(np.uint8), patch))
    if mask is not None:
        mask = np.asarray(mask, bool)
        panels.append(nearest_upscale(np.stack([mask.astype(np.uint8) * 255] * 3, -1), patch))
        mrgb = np.asarray(pca_rgb(jnp.asarray(feats), jnp.asarray(mask)))
        panels.append(nearest_upscale((mrgb * 255).astype(np.uint8), patch))
    hh = max(p.shape[0] for p in panels)
    panels = [
        np.pad(p, ((0, hh - p.shape[0]), (0, 0), (0, 0))) if p.shape[0] < hh else p
        for p in panels
    ]
    return np.concatenate(panels, axis=1)
