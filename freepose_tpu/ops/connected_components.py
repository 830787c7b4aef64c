"""Connected components on TPU: iterative min-label propagation.

Device-side equivalent of the reference's only first-party CUDA kernel — the
SAM2 Block-Union-Find connected components
(segment-anything-2/sam2/csrc/connected_components.cu, 289 LoC, atomicMin
union-find over [N,1,H,W] uint8 masks) — and of the scipy.ndimage.label +
regionprops largest-component extraction used by the pipeline
(src/pipeline/utils.py:71-84).

Union-find is pointer-chasing and does not map to a vector unit; the
TPU-native formulation is label relaxation: initialise every foreground pixel
with its linear index, then repeat { 4-neighbour min, pointer-jump
label <- label[label] } under lax.while_loop until fixpoint. The pointer-jump
(one gather) gives logarithmic convergence on long snake-like components
instead of O(perimeter) rounds. Areas come from one segment_sum, matching the
CUDA kernel's per-label counts output.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Python int (weakly typed in jnp ops -> int32), NOT jnp.int32(...): a
# module-level jnp call would initialise the default backend at import time,
# breaking CPU-platform selection in the multichip dryrun.
_BIG = 2**30


@jax.jit
def label_components(mask: jax.Array) -> jax.Array:
    """[H, W] bool -> int32 labels (min linear index of each 4-connected
    component; background = -1)."""
    h, w = mask.shape
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(mask, idx, _BIG)

    def neighbor_min(lab):
        padded = jnp.pad(lab, 1, constant_values=_BIG)
        m = jnp.minimum(
            jnp.minimum(padded[:-2, 1:-1], padded[2:, 1:-1]),
            jnp.minimum(padded[1:-1, :-2], padded[1:-1, 2:]),
        )
        return jnp.where(mask, jnp.minimum(lab, m), _BIG)

    def pointer_jump(lab):
        flat = lab.reshape(-1)
        safe = jnp.where(flat >= _BIG, 0, flat)
        jumped = jnp.where(flat >= _BIG, flat, flat[safe])
        return jumped.reshape(h, w)

    def body(state):
        lab, _ = state
        new = pointer_jump(neighbor_min(lab))
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    return jnp.where(mask, labels, -1)


@jax.jit
def component_areas(labels: jax.Array) -> jax.Array:
    """int32 labels -> per-pixel area of the pixel's component [H, W]."""
    h, w = labels.shape
    flat = labels.reshape(-1)
    seg = jnp.where(flat < 0, h * w, flat)  # park background in an extra bin
    counts = jax.ops.segment_sum(jnp.ones_like(seg), seg, num_segments=h * w + 1)
    return jnp.where(flat < 0, 0, counts[jnp.minimum(seg, h * w)]).reshape(h, w)


@jax.jit
def largest_component(mask: jax.Array) -> jax.Array:
    """[H, W] bool -> bool mask of the largest 4-connected component
    (reference extract_largest_component, utils.py:71-84)."""
    labels = label_components(mask)
    areas = component_areas(labels)
    best_area = jnp.max(areas)
    # Among components of maximal area, pick the one with the smallest label
    # (deterministic tie-break).
    candidate = jnp.where(areas == best_area, labels, _BIG)
    best_label = jnp.min(jnp.where(mask, candidate, _BIG))
    return labels == best_label


@partial(jax.jit, static_argnames=("max_area",))
def remove_small_components(mask: jax.Array, max_area: int, fill_holes: bool = True) -> jax.Array:
    """Remove small speckles; with fill_holes=True, also fill small
    background holes (the two uses of the SAM2 CUDA kernel:
    fill_holes_in_mask_scores, sam2/utils/misc.py:217-242, and
    postprocess_masks hole/sprinkle removal, sam2/utils/transforms.py:76-107).
    """
    out = mask
    # Fill holes: background components smaller than max_area become fg.
    if fill_holes:
        bg_labels = label_components(~out)
        bg_areas = component_areas(bg_labels)
        out = out | ((~out) & (bg_areas <= max_area))
    # Remove sprinkles: fg components smaller than max_area become bg.
    fg_labels = label_components(out)
    fg_areas = component_areas(fg_labels)
    out = out & (fg_areas > max_area)
    return out


@jax.jit
def connected_components_batch(masks: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[N, H, W] bool -> (labels [N, H, W] int32, areas [N, H, W] int32) —
    the CUDA kernel's (labels, counts) interface."""

    def one(m):
        lab = label_components(m)
        return lab, component_areas(lab)

    return jax.lax.map(one, masks)
