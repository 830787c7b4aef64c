"""Proposal container: detection crops + masks, device-resident.

Counterpart of the reference `Proposals` (src/pipeline/utils.py:18-69), with
the N-proposal crop done as one fused gather (no N-fold image repeat) and RLE
/ BOP-dict export at the host boundary only.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.crop import crop_resize_pad
from freepose_tpu.io.proposals_json import proposal_entry


@dataclasses.dataclass
class Proposals:
    """proposals: [N, 3, T, T] masked RGB crops; masks: [N, T, T] bool crops
    of the detection masks; boxes: [N, 4] xyxy (int); full_masks: [N, H, W]."""

    proposals: jax.Array
    masks: jax.Array
    boxes: jax.Array
    full_masks: jax.Array
    scene_id: int | None = None
    frame_id: int | None = None
    scores: list = dataclasses.field(default_factory=list)
    meshes: list = dataclasses.field(default_factory=list)

    def __len__(self) -> int:
        return int(self.boxes.shape[0])

    def to_bop_dicts(self, time: float = 0.01) -> list[dict]:
        boxes = np.asarray(self.boxes)
        masks = np.asarray(self.full_masks)
        return [
            proposal_entry(
                boxes[i], masks[i], self.meshes[i], self.scores[i],
                self.scene_id or 0, self.frame_id or 0, time=time,
            )
            for i in range(len(self))
        ]


def extract_proposals(
    image: jax.Array,  # [H, W, 3] uint8 or float in [0,1]
    masks: jax.Array,  # [N, H, W] bool
    boxes: jax.Array,  # [N, 4] xyxy
    target_size: int = 420,
    bbox_extend: float = 0.2,
    mask_rgb: bool = True,
    scene_id: int | None = None,
    frame_id: int | None = None,
) -> Proposals:
    """Crop each detection to a square target (reference utils.py:32-52)."""
    img = image.astype(jnp.float32)
    if img.dtype != jnp.float32 or (image.dtype == jnp.uint8):
        img = image.astype(jnp.float32)
    if image.dtype == jnp.uint8:
        img = img / 255.0
    chw = img.transpose(2, 0, 1)  # [3, H, W]
    n = masks.shape[0]
    rgb = jnp.where(masks[:, None], chw[None], 0.0) if mask_rgb else jnp.broadcast_to(chw, (n,) + chw.shape)
    crops = crop_resize_pad(rgb, boxes, target_size, extend=bbox_extend)
    mask_crops = crop_resize_pad(
        masks[:, None].astype(jnp.float32), boxes, target_size, extend=bbox_extend
    )[:, 0] > 0.5
    return Proposals(
        proposals=crops,
        masks=mask_crops,
        boxes=jnp.floor(boxes.astype(jnp.float32)).astype(jnp.int32),
        full_masks=masks,
        scene_id=scene_id,
        frame_id=frame_id,
    )


@functools.partial(jax.jit, static_argnames=("target_size", "bbox_extend"))
def proposals_from_masks_video(
    frames: jax.Array,  # [K, H, W, 3] uint8/float frames (device-resident)
    masks: jax.Array,  # [K, H, W] bool (e.g. a SAM2 propagation chunk output)
    target_size: int = 420,
    bbox_extend: float = 0.2,
):
    """Device-coupled mask -> bbox -> crop_resize_pad for a batch of video
    frames, ONE program: the refine chain consumes these device-resident
    proposals directly from the SAM2 propagation output — no per-frame mask
    fetch or host re-upload (the reference flow materializes masks to disk
    between extract_proposals_ground_video and dino_inference_video;
    dino_inference_video.py:150-155 re-uploaded host masks each frame).

    Returns (crops [K, 3, T, T] f32, mask crops [K, T, T] bool,
    bboxes [K, 4] f32). Per-frame results equal extract_proposals on the
    host mask/bbox (parity-tested). Empty masks fall back to a centred
    half-frame box (degenerate-detection guard)."""
    from freepose_tpu.geometry.boxes import mask_to_bbox

    kf, h, w = masks.shape
    bboxes = jax.vmap(mask_to_bbox)(masks).astype(jnp.float32)
    empty = ~jnp.any(masks.reshape(kf, -1), axis=1)
    fallback = jnp.asarray([w * 0.25, h * 0.25, w * 0.75, h * 0.75], jnp.float32)
    bboxes = jnp.where(empty[:, None], fallback[None], bboxes)
    img = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        img = img / 255.0
    chw = img.transpose(0, 3, 1, 2)  # [K, 3, H, W]
    rgb = jnp.where(masks[:, None], chw, 0.0)
    crops = crop_resize_pad(rgb, bboxes, target_size, extend=bbox_extend)
    mask_crops = crop_resize_pad(
        masks[:, None].astype(jnp.float32), bboxes, target_size, extend=bbox_extend
    )[:, 0] > 0.5
    return crops, mask_crops, bboxes


def retrieve_topk(
    image: jax.Array,  # [H, W, 3]
    masks: jax.Array,  # [N, H, W] bool
    boxes: jax.Array,  # [N, 4] xyxy
    bank: jax.Array,  # [M, D] normalized retrieval bank (device-resident)
    extractor,  # DinoFeatureExtractor
    layer: int,
    feature_type: str = "ffa",
    k: int = 100,
    target_size: int = 420,
    bbox_extend: float = 0.1,
):
    """Fused per-frame retrieval: proposal crops + DINOv2 + FFA/cls pooling +
    bank top-k in ONE program (extractor params enter as jit arguments) —
    the reference's four-stage hot loop (extract_proposals_ground.py:59-140)
    without a host round trip between stages. Pads the proposal count to the
    next power of two so per-frame detection counts reuse a few compiled
    shapes. Returns (scores [N, k], indices [N, k], feats [N, D])."""
    n = masks.shape[0]
    n_pad = 1 << max(n - 1, 0).bit_length()
    if n_pad != n:
        masks = jnp.concatenate([masks, jnp.zeros((n_pad - n,) + masks.shape[1:], masks.dtype)])
        boxes = jnp.concatenate([boxes, jnp.tile(boxes[-1:], (n_pad - n, 1))])
    scores, idx, feats = _retrieve_fused_jit(
        image, masks, boxes, bank, extractor.params_for(layer),
        target_size=target_size, bbox_extend=bbox_extend, extractor=extractor,
        layer=layer, feature_type=feature_type, k=k,
    )
    return scores[:n], idx[:n], feats[:n]


@functools.partial(
    jax.jit,
    static_argnames=("target_size", "bbox_extend", "extractor", "layer", "feature_type", "k"),
)
def _retrieve_fused_jit(
    image, masks, boxes, bank, fe_params,
    target_size, bbox_extend, extractor, layer, feature_type, k,
):
    from freepose_tpu.models.dinov2 import _extract_jit
    from freepose_tpu.ops.knn import topk_search
    from freepose_tpu.ops.sampling import ffa_pool
    from freepose_tpu.pipeline.template_bank import normalize_feats

    prop = extract_proposals(image, masks, boxes, target_size, bbox_extend)
    if feature_type == "cls":
        feats = normalize_feats(
            _extract_jit.__wrapped__(extractor, fe_params, prop.proposals, layer, "cls")
        )
    else:
        patch = _extract_jit.__wrapped__(extractor, fe_params, prop.proposals, layer, "patch")
        feats = ffa_pool(patch, prop.masks, grid=target_size // extractor.config.patch_size)
    scores, idx = topk_search(bank, feats, k)
    return scores, idx, feats
