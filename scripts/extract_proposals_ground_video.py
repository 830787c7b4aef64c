"""Video proposal generation: detect on frame 0, propagate masks, retrieve.

CLI counterpart of reference scripts/extract_proposals_ground_video.py:
GroundingDINO boxes on frame 0 (:17-50) -> SAM2 VIDEO mask propagation over
all frames (:53-115; here the batched multi-object functional tracker) ->
per-frame FFA retrieval (:118-184) -> temporal SOFT-VOTING mean of per-frame
bank scores per track (:186-196) -> one mesh id per track -> proposal JSON.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.boxes import mask_to_bbox
from freepose_tpu.io.proposals_json import proposal_entry, save_proposals
from freepose_tpu.ops.knn import topk_search
from freepose_tpu.ops.sampling import ffa_pool
from freepose_tpu.pipeline.proposals import extract_proposals
from scripts.common import add_shard_args, load_dino_extractor, load_filelist, load_params
from scripts.dino_inference_video import load_frames
from scripts.extract_proposals_ground import _cached_grounding


def load_video_predictor(args):
    import os

    from freepose_tpu.models.sam2.video import Sam2VideoConfig, Sam2VideoModel
    from freepose_tpu.models.sam2.predictor import Sam2VideoPredictor

    from scripts.common import production_sam2_video_config

    cfg = production_sam2_video_config()  # bf16 trunk on accelerators
    params = load_params(args.sam2_weights) if args.sam2_weights else None
    if params is None:
        from freepose_tpu.models.sam2.video import init_object_state

        model = Sam2VideoModel(cfg)
        state0 = init_object_state(cfg)

        def full(mdl, pixels):
            pyramid, pos = mdl.embed_frame(pixels)
            st, _ = mdl.track_step(
                state0, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(2),
                points=jnp.zeros((1, 1, cfg.max_point_prompts, 2)),
                labels=jnp.full((1, 1, cfg.max_point_prompts), -10, jnp.int32), is_init=True,
            )
            # Also trace the MASK-prompt branch (mask_downsample + the prompt
            # encoder's mask path) so add_new_mask works on random init.
            st, _ = mdl.track_step(
                st, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(2),
                mask_inputs=jnp.zeros((1, cfg.image_size, cfg.image_size)),
                is_init=True,
            )
            return mdl.track_step(st, pyramid, pyramid[2], pos[2], jnp.int32(1), jnp.int32(2))

        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, cfg.image_size, cfg.image_size)), method=full
        )["params"]
    mesh = None
    if getattr(args, "shard_objects", False):
        from freepose_tpu.parallel.mesh import make_mesh, maybe_initialize_distributed

        maybe_initialize_distributed()
        mesh = make_mesh(data=len(jax.devices()), model=1)
    return Sam2VideoPredictor(cfg, params, device_mesh=mesh)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video-dir", required=True)
    ap.add_argument("--bank", required=True)
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--detector", choices=["grounding", "boxes"], default="grounding")
    ap.add_argument("--boxes", default=None, help="frame-0 boxes .npy [N, 4] xyxy (detector=boxes)")
    ap.add_argument("--text-prompt", default="objects.")
    ap.add_argument("--box-threshold", type=float, default=0.15)
    ap.add_argument("--text-threshold", type=float, default=0.15)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--sam2-weights", default=None)
    ap.add_argument("--grounding-weights", default=None)
    ap.add_argument("--layer", type=int, default=22)
    ap.add_argument("--min-mask-px", type=int, default=400)
    ap.add_argument("--shard-objects", action="store_true",
                    help="shard SAM2 mask propagation per-object over the "
                         "device mesh (multi-chip; M objects in ~1 object's time)")
    add_shard_args(ap)
    args = ap.parse_args()

    frames = load_frames(args.video_dir)
    if args.detector == "boxes":
        boxes0 = np.load(args.boxes).reshape(-1, 4)
    else:
        det = _cached_grounding(args)
        boxes0, _ = det.detect(
            frames[0], text=args.text_prompt,
            box_threshold=args.box_threshold, text_threshold=args.text_threshold,
        )
    if len(boxes0) == 0:
        save_proposals([], args.out)
        print("no detections on frame 0")
        return

    predictor = load_video_predictor(args)
    state = predictor.init_state(frames)
    for i, box in enumerate(boxes0):
        state = predictor.add_new_points_or_box(state, 0, obj_id=i, box=np.asarray(box))

    names = load_filelist(args.filelist)
    bank = np.load(args.bank).astype(np.float32)
    bank /= np.maximum(np.linalg.norm(bank, axis=-1, keepdims=True), 1e-12)
    bank_dev = jnp.asarray(bank)
    extractor = load_dino_extractor(args.weights)

    per_track_scores: dict[int, list] = {i: [] for i in range(len(boxes0))}
    track_masks: dict[tuple, np.ndarray] = {}
    track_boxes: dict[tuple, np.ndarray] = {}
    for t, obj_ids, low, masks in predictor.propagate_in_video(state, binarize=True):
        # masks [N, H, W] bool, thresholded on device (4x less transfer)
        for oi in range(len(obj_ids)):
            m = masks[oi]
            if m.sum() < args.min_mask_px:
                continue
            bbox = np.asarray(mask_to_bbox(jnp.asarray(m)))
            track_masks[(t, oi)] = m
            track_boxes[(t, oi)] = bbox
            prop = extract_proposals(
                jnp.asarray(frames[t]), jnp.asarray(m[None]),
                jnp.asarray(bbox[None].astype(np.float32)), target_size=420, bbox_extend=0.1,
            )
            patch = extractor(prop.proposals, layer=args.layer, feature_type="patch")
            feat = ffa_pool(patch, prop.masks, grid=30)
            scores = jnp.einsum("nd,md->nm", feat, bank_dev)[0]
            per_track_scores[oi].append(np.asarray(scores))
        print(f"frame {t}: {len(obj_ids)} objects tracked")

    # Temporal soft voting: mean of per-frame bank scores -> one mesh/track.
    out = []
    for oi, score_list in per_track_scores.items():
        if not score_list:
            continue
        mean_scores = np.mean(score_list, axis=0)
        best = int(np.argmax(mean_scores))
        for (t, o), m in track_masks.items():
            if o != oi:
                continue
            entry = proposal_entry(
                track_boxes[(t, o)], m, names[best], float(mean_scores[best]), 0, t,
            )
            entry["track_id"] = oi
            out.append(entry)
    save_proposals(out, args.out)
    print(f"{len(out)} proposals ({len(per_track_scores)} tracks) -> {args.out}")


if __name__ == "__main__":
    main()
