"""SAM2 image/mask transforms: preprocessing + mask postprocessing.

Counterpart of the vendored SAM2Transforms (reference
segment-anything-2/sam2/utils/transforms.py:1-117): resize-to-square +
normalize on the way in; on the way out, upscale mask logits to the original
resolution and clean binarized masks by filling small background holes and
removing small speckles — the two uses of the reference's CUDA
connected-components kernel (transforms.py:76-107, misc.py:217-242), served
here by the TPU label-propagation kernel (or its native C++ twin on host).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.models.sam2.model import sam2_normalize
from freepose_tpu.ops.connected_components import remove_small_components
from freepose_tpu.ops.sampling import resize_bilinear


def preprocess(image: jax.Array, size: int = 1024) -> jax.Array:
    """[H, W, 3] uint8/float -> [1, 3, size, size] normalized (reference
    transforms.py resize + ImageNet normalize)."""
    img = image.astype(jnp.float32)
    if image.dtype == jnp.uint8:
        img = img / 255.0
    return sam2_normalize(resize_bilinear(img.transpose(2, 0, 1), (size, size))[None])


def postprocess_masks(
    low_res_logits: jax.Array,  # [N, h, w]
    orig_hw: tuple[int, int],
    mask_threshold: float = 0.0,
    fill_hole_area: int = 8,
    use_native: bool = False,
) -> np.ndarray:
    """Logits -> cleaned boolean masks at the original resolution.

    Hole/sprinkle cleanup runs before the final upscale (like the reference,
    which cleans at the low-res logit scale then interpolates).
    """
    masks = low_res_logits > mask_threshold
    if fill_hole_area > 0:
        if use_native:
            from freepose_tpu.ops.cc_native import remove_small_components as native_rm

            masks = jnp.asarray(native_rm(np.asarray(masks), fill_hole_area))
        else:
            masks = jax.lax.map(lambda m: remove_small_components(m, fill_hole_area), masks)
    # Upscale cleaned masks bilinearly and re-threshold.
    up = resize_bilinear(masks.astype(jnp.float32), orig_hw)
    return np.asarray(up > 0.5)
