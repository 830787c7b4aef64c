"""SAM2 automatic mask generation: grid-prompted whole-image segmentation.

TPU-native counterpart of the vendored SAM2AutomaticMaskGenerator
(reference segment-anything-2/sam2/automatic_mask_generator.py:36-434):
prompt a point grid over the image, decode multimask predictions per point,
filter by predicted IoU / stability / crop-edge proximity, deduplicate with
box NMS, and emit BOP-compatible RLE or binary-mask records.

TPU-first layout: each `points_per_batch` chunk runs as ONE jitted program —
decode + full-res upsample + stability score + binarize + boxes all on
device with static shapes (the reference interleaves GPU kernels with host
filtering per batch). Per-mask keep decisions, RLE encoding and NMS are
data-dependent small-N work and run on host (same device/host split as EPnP
and the eval-side renderer selection). The optional m2m refinement re-decodes
every surviving point with its low-res mask as a per-prompt dense embedding
(rank-5 mask_inputs through PromptEncoder.dense_embedding).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.boxes import nms_xyxy
from freepose_tpu.io.rle import decode_rle, encode_rle, rle_area
from freepose_tpu.models.sam2.amg import (
    batched_mask_to_box,
    build_all_layer_point_grids,
    calculate_stability_score,
    generate_crop_boxes,
    is_box_near_crop_edge,
)
from freepose_tpu.models.sam2.model import Sam2ImageModel
from freepose_tpu.models.sam2.predictor import (
    Sam2ImagePredictor,
    _packbits_last,
    _unpackbits_last,
    scale_coords,
)
from freepose_tpu.ops.sampling import resize_bilinear


class Sam2AutomaticMaskGenerator:
    """Generate masks for a whole image from a point grid.

    `generate(image)` returns a list of records with the reference's keys:
    segmentation (bool [H, W] or RLE dict), area, bbox (xywh), predicted_iou,
    point_coords, stability_score, crop_box (xywh).
    """

    def __init__(
        self,
        predictor: Sam2ImagePredictor,
        points_per_side: int | None = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.8,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        mask_threshold: float = 0.0,
        box_nms_thresh: float = 0.7,
        crop_n_layers: int = 0,
        crop_nms_thresh: float = 0.7,
        crop_overlap_ratio: float = 512 / 1500,
        crop_n_points_downscale_factor: int = 1,
        point_grids: list[np.ndarray] | None = None,
        min_mask_region_area: int = 0,
        output_mode: str = "binary_mask",
        use_m2m: bool = False,
        multimask_output: bool = True,
    ) -> None:
        assert (points_per_side is None) != (point_grids is None), (
            "exactly one of points_per_side / point_grids"
        )
        assert output_mode in ("binary_mask", "uncompressed_rle")
        if points_per_side is not None:
            self.point_grids = build_all_layer_point_grids(
                points_per_side, crop_n_layers, crop_n_points_downscale_factor
            )
        else:
            self.point_grids = point_grids
        self.predictor = predictor
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.mask_threshold = mask_threshold
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode
        self.use_m2m = use_m2m
        self.multimask_output = multimask_output

        model = predictor.model
        params = predictor.params
        image_size = predictor.image_size

        @partial(jax.jit, static_argnames=("out_hw", "multimask"))
        def _batch(params, pyramid, points_px, out_hw, multimask):
            """points_px [P, 2] in crop pixels -> per (point, mask-slot):
            binarized masks [P, M, h, w] bool, logits' low-res [P, M, g, g],
            iou [P, M], stability [P, M], boxes xyxy [P, M, 4]."""
            pts = scale_coords(points_px[None, :, None, :], out_hw, image_size)
            low, iou, _, _ = model.apply(
                {"params": params}, pyramid, points=pts,
                labels=jnp.ones(pts.shape[:3], jnp.int32),
                multimask_output=multimask, method=Sam2ImageModel.decode_masks,
            )
            logits = resize_bilinear(low[0], out_hw)  # [P, M, h, w]
            stab = calculate_stability_score(
                logits, self.mask_threshold, self.stability_score_offset
            )
            masks = logits > self.mask_threshold
            boxes = batched_mask_to_box(masks)
            # Masks leave the device bit-packed (8 px/byte); the caller
            # unpacks on host — 8x less transfer on remote-attached TPUs.
            return _packbits_last(masks), low[0], iou[0], stab, boxes

        @partial(jax.jit, static_argnames=("out_hw",))
        def _m2m(params, pyramid, points_px, low_res, out_hw):
            """Refine each point with its low-res mask as a dense prompt
            (reference refine_with_m2m: multimask_output=False)."""
            pts = scale_coords(points_px[None, :, None, :], out_hw, image_size)
            low, iou, _, _ = model.apply(
                {"params": params}, pyramid, points=pts,
                labels=jnp.ones(pts.shape[:3], jnp.int32),
                mask_inputs=low_res[None, :, None],
                multimask_output=False, method=Sam2ImageModel.decode_masks,
            )
            logits = resize_bilinear(low[0, :, 0], out_hw)  # [P, h, w]
            stab = calculate_stability_score(
                logits, self.mask_threshold, self.stability_score_offset
            )
            masks = logits > self.mask_threshold
            return _packbits_last(masks), iou[0, :, 0], stab, batched_mask_to_box(masks)

        self._params = params
        self._batch_fn = _batch
        self._m2m_fn = _m2m

    # -- public API ---------------------------------------------------------

    def generate(self, image: np.ndarray) -> list[dict]:
        """image [H, W, 3] uint8 (or float 0-255) -> list of mask records."""
        data = self._generate_masks(np.asarray(image))
        records = []
        for i in range(len(data["rles"])):
            rle = data["rles"][i]
            seg = rle if self.output_mode == "uncompressed_rle" else _rle_to_mask(rle)
            x0, y0, x1, y1 = data["boxes"][i]
            cx0, cy0, cx1, cy1 = data["crop_boxes"][i]
            records.append({
                "segmentation": seg,
                "area": rle_area(rle),
                "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                "predicted_iou": float(data["iou_preds"][i]),
                "point_coords": [data["points"][i].tolist()],
                "stability_score": float(data["stability_score"][i]),
                "crop_box": [float(cx0), float(cy0), float(cx1 - cx0), float(cy1 - cy0)],
            })
        return records

    # -- internals ----------------------------------------------------------

    def _generate_masks(self, image: np.ndarray) -> dict:
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio
        )
        parts = [
            self._process_crop(image, box, layer, orig_size)
            for box, layer in zip(crop_boxes, layer_idxs)
        ]
        data = _cat(parts)
        if len(crop_boxes) > 1 and len(data["rles"]) > 0:
            # prefer masks from smaller crops
            areas = (data["crop_boxes"][:, 2] - data["crop_boxes"][:, 0]) * (
                data["crop_boxes"][:, 3] - data["crop_boxes"][:, 1]
            )
            keep = nms_xyxy(data["boxes"], 1.0 / np.maximum(areas, 1), self.crop_nms_thresh)
            data = _filter(data, keep)
        if self.min_mask_region_area > 0:
            data = self._postprocess_small_regions(
                data, self.min_mask_region_area, max(self.box_nms_thresh, self.crop_nms_thresh)
            )
        return data

    def _process_crop(
        self, image: np.ndarray, crop_box: list[int], layer_idx: int, orig_size: tuple
    ) -> dict:
        x0, y0, x1, y1 = crop_box
        crop = image[y0:y1, x0:x1]
        crop_hw = crop.shape[:2]
        self.predictor.set_image(jnp.asarray(crop))
        pyramid = self.predictor._pyramid

        points = self.point_grids[layer_idx] * np.array(crop_hw)[None, ::-1]
        parts = []
        bs = self.points_per_batch
        for s in range(0, len(points), bs):
            chunk = points[s : s + bs].astype(np.float32)
            pad = bs - len(chunk)  # static batch shape: one program per crop size
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
            part = self._process_batch(chunk, pyramid, crop_hw, crop_box, orig_size)
            if pad:
                valid = part["points_idx"] < bs - pad
                part = _filter(part, np.nonzero(valid)[0])
            parts.append(part)
        data = _cat(parts)
        data.pop("points_idx", None)

        if len(data["rles"]) > 0:
            keep = nms_xyxy(data["boxes"], data["iou_preds"], self.box_nms_thresh)
            data = _filter(data, keep)
        off = np.array([x0, y0, x0, y0], np.float32)
        data["boxes"] = data["boxes"] + off
        data["points"] = data["points"] + off[:2]
        data["crop_boxes"] = np.tile(
            np.asarray([crop_box], np.float32), (len(data["rles"]), 1)
        )
        return data

    def _process_batch(
        self, points: np.ndarray, pyramid, crop_hw: tuple, crop_box: list[int], orig_size: tuple
    ) -> dict:
        orig_h, orig_w = orig_size
        masks, low, iou, stab, boxes = self._batch_fn(
            self._params, pyramid, jnp.asarray(points), tuple(crop_hw), self.multimask_output
        )
        p, m = iou.shape
        flat = lambda a: np.asarray(a).reshape(p * m, *a.shape[2:])
        iou, stab, boxes = flat(iou), flat(stab), flat(boxes)
        points_idx = np.repeat(np.arange(p), m)

        if self.use_m2m:
            # refine every candidate; filters apply to the refined outputs
            masks, iou, stab, boxes = self._m2m_fn(
                self._params, pyramid, jnp.asarray(points)[points_idx],
                low.reshape(p * m, *low.shape[2:]), tuple(crop_hw),
            )
            iou, stab, boxes = np.asarray(iou), np.asarray(stab), np.asarray(boxes)
            masks_np = _unpackbits_last(np.asarray(masks), crop_hw[1])
        else:
            masks_np = _unpackbits_last(flat(masks), crop_hw[1])

        keep = np.ones(p * m, bool)
        if self.pred_iou_thresh > 0.0:
            keep &= iou > self.pred_iou_thresh
        if self.stability_score_thresh > 0.0:
            keep &= stab >= self.stability_score_thresh
        keep &= ~is_box_near_crop_edge(boxes, crop_box, [0, 0, orig_w, orig_h])
        idx = np.nonzero(keep)[0]

        ch, cw = crop_hw
        rles = []
        for i in idx:
            mask = masks_np[i]
            if (ch, cw) != (orig_h, orig_w):  # uncrop into the full canvas
                full = np.zeros((orig_h, orig_w), bool)
                full[crop_box[1] : crop_box[3], crop_box[0] : crop_box[2]] = mask
                mask = full
            rles.append(encode_rle(mask))
        return {
            "rles": rles,
            "iou_preds": iou[idx],
            "stability_score": stab[idx],
            "boxes": boxes[idx].astype(np.float32),
            "points": points[points_idx[idx]],
            "points_idx": points_idx[idx],
        }

    def _postprocess_small_regions(self, data: dict, min_area: int, nms_thresh: float) -> dict:
        """Remove small islands/holes, then re-NMS (reference :367-415);
        unchanged masks win ties (score 1 vs 0)."""
        if len(data["rles"]) == 0:
            return data
        from freepose_tpu.ops.connected_components import remove_small_components

        masks, scores = [], []
        for rle in data["rles"]:
            mask = _rle_to_mask(rle)
            cleaned = np.asarray(
                remove_small_components(jnp.asarray(mask), min_area)
            )
            masks.append(cleaned)
            scores.append(float(np.array_equal(cleaned, mask)))
        masks = np.stack(masks)
        boxes = np.asarray(batched_mask_to_box(jnp.asarray(masks))).astype(np.float32)
        keep = nms_xyxy(boxes, np.asarray(scores), nms_thresh)
        for i in keep:
            if scores[i] == 0.0:
                data["rles"][i] = encode_rle(masks[i])
                data["boxes"][i] = boxes[i]
        return _filter(data, keep)


def _rle_to_mask(rle: dict) -> np.ndarray:
    return decode_rle(rle)


def _cat(parts: list[dict]) -> dict:
    out = {}
    if not parts:
        return {"rles": [], "iou_preds": np.zeros(0), "stability_score": np.zeros(0),
                "boxes": np.zeros((0, 4), np.float32), "points": np.zeros((0, 2), np.float32),
                "crop_boxes": np.zeros((0, 4), np.float32)}
    for k in parts[0]:
        vals = [p[k] for p in parts]
        out[k] = (
            [r for v in vals for r in v] if k == "rles" else np.concatenate(vals, axis=0)
        )
    return out


def _filter(data: dict, idx: np.ndarray) -> dict:
    return {
        k: ([v[i] for i in idx] if k == "rles" else v[idx]) for k, v in data.items()
    }
