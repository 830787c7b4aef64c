"""Static-image proposal generation + CAD retrieval.

CLI counterpart of reference scripts/extract_proposals_ground.py:
open-vocabulary boxes (GroundingDINO, prompt "objects.") -> SAM2 masks ->
tiny-mask filtering -> DINOv2 FFA features with 30×30 mask pooling -> top-k
over the HBM-resident retrieval bank (sharded across chips when a mesh is
available) -> optional per-view fine rerank -> proposal JSON.

Detector backends:
  grounding  — GroundingDINO boxes + SAM2 masks (needs converted weights);
  gt-boxes   — GT bboxes + SAM2 masks;
  gt-masks   — GT visible masks directly (detector-free minimum slice).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.datasets.bop import BOPDataset
from freepose_tpu.io.proposals_json import proposal_entry, save_proposals
from freepose_tpu.ops.knn import fine_rerank_scores
from freepose_tpu.pipeline.proposals import extract_proposals, retrieve_topk
from scripts.common import (
    add_shard_args,
    get_shard,
    load_dino_extractor,
    load_filelist,
    load_params,
    proposals_filename,
)


def detect(args, entry):
    """-> (masks [N, H, W] bool, boxes [N, 4] xyxy, det_scores [N])."""
    if args.detector == "gt-masks":
        return entry["masks"], entry["boxes"], np.ones(len(entry["boxes"]))
    if args.detector in ("grounding", "gt-boxes"):
        if args.detector == "grounding":
            from freepose_tpu.models.grounding_dino import GroundingDinoDetector

            detector = _cached_grounding(args)
            boxes, det_scores = detector.detect(
                entry["image"], text=args.text_prompt,
                box_threshold=args.box_threshold, text_threshold=args.text_threshold,
            )
        else:
            boxes, det_scores = entry["boxes"], np.ones(len(entry["boxes"]))
        if len(boxes) == 0:
            return np.zeros((0,) + entry["image"].shape[:2], bool), boxes, det_scores
        predictor = _cached_sam2(args)
        predictor.set_image(jnp.asarray(entry["image"]))
        # All boxes decode as ONE batched prompt set (prompts are independent
        # in the mask decoder; batched == per-box verified in tests).
        m, _, _ = predictor.predict(
            box=np.asarray(boxes), multimask_output=False, return_logits=False,
            fetch_low_res_logits=False,  # skip the PxMx256KB device->host fetch
        )
        return m[:, 0], np.asarray(boxes), np.asarray(det_scores)
    raise ValueError(args.detector)


_CACHE: dict = {}


def _cached_sam2(args):
    if "sam2" not in _CACHE:
        from freepose_tpu.models.sam2.model import Sam2ImageModel
        from freepose_tpu.models.sam2.predictor import Sam2ImagePredictor
        from scripts.common import production_sam2_config

        cfg, size = production_sam2_config()  # bf16 on accelerators
        params = load_params(args.sam2_weights) if args.sam2_weights else None
        if params is None:
            model = Sam2ImageModel(cfg)
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 3, size, size))
            )["params"]
        _CACHE["sam2"] = Sam2ImagePredictor(cfg, params, image_size=size)
    return _CACHE["sam2"]


def _cached_grounding(args):
    if "grounding" not in _CACHE:
        from freepose_tpu.models.grounding_dino import GroundingDinoDetector
        from scripts.common import production_gdino_config

        _CACHE["grounding"] = GroundingDinoDetector.from_weights(
            args.grounding_weights, config=production_gdino_config()
        )
    return _CACHE["grounding"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--bank", required=True, help="[N, D] retrieval bank .npy")
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--detector", choices=["grounding", "gt-boxes", "gt-masks"], default="grounding")
    ap.add_argument("--text-prompt", default="objects.")
    ap.add_argument("--box-threshold", type=float, default=0.15)
    ap.add_argument("--text-threshold", type=float, default=0.15)
    ap.add_argument("--weights", default=None, help="DINOv2 params (.npz)")
    ap.add_argument("--sam2-weights", default=None)
    ap.add_argument("--grounding-weights", default=None)
    ap.add_argument("--layer", type=int, default=22)
    ap.add_argument("--feature-type", choices=["ffa", "cls"], default="ffa")
    ap.add_argument("--topk", type=int, default=0, help=">0 enables per-view fine rerank")
    ap.add_argument("--fine-features-dir", default=None, help="per-mesh [V, D] .npy dir")
    ap.add_argument("--fine-bank", default=None, help="consolidated memmap bank (io.npy_bank)")
    ap.add_argument("--min-mask-px", type=int, default=400)
    add_shard_args(ap)
    args = ap.parse_args()

    dataset = BOPDataset(args.dataset, args.split)
    names = load_filelist(args.filelist)
    bank = np.load(args.bank).astype(np.float32)
    bank /= np.maximum(np.linalg.norm(bank, axis=-1, keepdims=True), 1e-12)
    bank_dev = jnp.asarray(bank)
    extractor = load_dino_extractor(args.weights)

    out = []
    shard = get_shard(args)
    for idx in shard.slice(len(dataset)):
        entry = dataset[idx]
        masks, boxes, det_scores = detect(args, entry)
        keep = [i for i, m in enumerate(masks) if m.sum() >= args.min_mask_px]
        if not keep:
            continue
        masks, boxes = masks[keep], np.asarray(boxes)[keep]
        # Fused: crops + DINOv2 + FFA/cls + bank top-k in one program.
        scores, indices, feats = retrieve_topk(
            jnp.asarray(entry["image"]), jnp.asarray(masks),
            jnp.asarray(boxes, jnp.float32), bank_dev, extractor,
            layer=args.layer, feature_type=args.feature_type,
            k=min(100, len(names)), target_size=420, bbox_extend=0.1,
        )
        scores, indices = np.asarray(scores), np.asarray(indices)
        for i in range(len(masks)):
            if args.topk > 0 and (args.fine_bank or args.fine_features_dir):
                if args.fine_bank:
                    if not hasattr(main, "_fine_bank"):
                        from freepose_tpu.io.npy_bank import FineFeatureBank

                        main._fine_bank = FineFeatureBank(args.fine_bank)
                    fine = jnp.asarray(main._fine_bank.gather(indices[i]))
                else:
                    cand = []
                    for row in indices[i]:
                        f = np.load(Path(args.fine_features_dir) / f"{names[row]}.npy")
                        f /= np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
                        cand.append(f)
                    fine = jnp.asarray(np.stack(cand))
                fine_scores = np.asarray(fine_rerank_scores(fine, feats[i], args.topk))
                best = int(np.argmax(fine_scores))
                mesh, score = names[indices[i][best]], float(fine_scores[best])
            else:
                mesh, score = names[indices[i][0]], float(scores[i][0])
            out.append(proposal_entry(
                boxes[i], masks[i], mesh, score, entry["scene_id"], entry["frame_id"],
            ))

    name = proposals_filename(
        args.box_threshold, args.text_threshold, args.feature_type, args.layer,
        args.topk, Path(args.dataset).name,
    )
    path = Path(args.out_dir) / name
    save_proposals(out, path)
    print(f"{len(out)} proposals -> {path}")


if __name__ == "__main__":
    main()
