"""Static-image coarse 6D pose inference from proposals.

CLI counterpart of reference scripts/dino_inference.py: for each frame's
proposals (JSON with RLE masks + retrieved mesh ids), crop, extract DINOv2
features, match against the mesh's 600-view template pack, z-lift, and write
the BOP CSV (t in millimetres). Scenes shard across workers (30 per task by
default, like the reference's SLURM arrays, dino_inference.py:52-54); the
`time` column records REAL per-proposal seconds (the reference hard-codes
0.2, :127).
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from freepose_tpu.datasets.bop import BOPDataset
from freepose_tpu.datasets.template import WebTemplateDataset
from freepose_tpu.io.bop_csv import PoseResult, write_results_csv
from freepose_tpu.io.proposals_json import (
    filter_by_frame,
    load_proposals,
    proposal_bbox_xyxy,
    proposal_mask,
)
from freepose_tpu.pipeline.pose_estimator import CoarsePoseEstimator
from freepose_tpu.pipeline.proposals import extract_proposals
from freepose_tpu.pipeline.scale_estimator import depth_scales
from freepose_tpu.pipeline.template_bank import TemplateBank
from freepose_tpu.utils.timing import StageTimer
from scripts.common import add_shard_args, get_shard, load_dino_extractor, load_filelist


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, help="BOP dataset root")
    ap.add_argument("--split", default="test")
    ap.add_argument("--proposals", required=True, help="proposal JSON")
    ap.add_argument("--wds-dir", required=True, help="template shards dir")
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--out", required=True, help="output CSV")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--layer", type=int, default=22)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--bbox-extend", type=float, default=0.2)
    ap.add_argument("--depth-method", default="zoedepth",
                    choices=["depthmap", "zoedepth", "const-0.05", "const-0.1"])
    ap.add_argument("--scenes-per-task", type=int, default=30)
    ap.add_argument("--cache-dir", default=None)
    add_shard_args(ap)
    args = ap.parse_args()

    dataset = BOPDataset(args.dataset, args.split)
    props = load_proposals(args.proposals)
    templates = WebTemplateDataset(args.wds_dir, load_filelist(args.filelist))
    extractor = load_dino_extractor(args.weights)
    feature_fn = lambda imgs: extractor(imgs, layer=args.layer, feature_type="patch")
    bank = TemplateBank(feature_fn, cache_size=8, cache_dir=args.cache_dir, batch_size=args.batch_size)
    estimator = CoarsePoseEstimator(feature_fn, bank)
    timer = StageTimer()

    shard = get_shard(args)
    frame_indices = shard.slice(len(dataset), chunk=None if shard.count == 1 else args.scenes_per_task)

    results: list[PoseResult] = []
    for idx in frame_indices:
        entry = dataset[idx]
        scene_props = filter_by_frame(props, entry["scene_id"], entry["frame_id"])
        if not scene_props:
            continue
        masks = np.stack([proposal_mask(p) for p in scene_props])
        boxes = np.stack([proposal_bbox_xyxy(p) for p in scene_props]).astype(np.float32)
        mesh_ids = [p["mesh"] for p in scene_props]
        det_scores = [p["score"] for p in scene_props]

        with timer.stage("proposals"):
            prop = extract_proposals(
                jnp.asarray(entry["image"]), jnp.asarray(masks), jnp.asarray(boxes),
                target_size=420, bbox_extend=args.bbox_extend,
            )

        if args.depth_method == "depthmap":
            scales = np.asarray(depth_scales(
                jnp.asarray(entry["depth"]), jnp.asarray(entry["intrinsic"], jnp.float32),
                jnp.asarray(masks), svd=True,
            ))
        elif args.depth_method.startswith("const-"):
            scales = np.full(len(scene_props), float(args.depth_method.split("-")[1]))
        else:  # zoedepth: scale carried in the proposal JSON (compute_scale)
            scales = np.asarray([max(p.get("scale", 0.1), 0.01) for p in scene_props])

        t0 = time.perf_counter()
        packs = []
        with timer.stage("templates"):
            for mesh_id in mesh_ids:
                item = templates.get_template_by_name(mesh_id)
                pack = bank.cache.get(item["model_name"])
                if pack is None:
                    from freepose_tpu.geometry.boxes import mask_to_bbox
                    from freepose_tpu.geometry.crop import crop_resize_pad
                    from freepose_tpu.geometry.rotation import template_poses

                    import jax

                    rgb = jnp.asarray(item["rgb"]).transpose(0, 3, 1, 2)
                    tmpl_boxes = jax.vmap(mask_to_bbox)(jnp.asarray(item["masks"]))
                    crops = crop_resize_pad(rgb, tmpl_boxes, 420)
                    pack = bank.pack_from_views(
                        item["model_name"],
                        crops,
                        jnp.asarray(item["depth"]),
                        template_poses(rgb.shape[0]),
                        jnp.asarray(item["intrinsic"]),
                    )
                    bank.cache[item["model_name"]] = pack
                packs.append(pack)
        with timer.stage("pose"):
            # One ViT batch for every proposal of the frame, then per-pack
            # scoring (estimator.estimate_batch).
            outs = estimator.estimate_batch(
                prop.proposals, packs, jnp.asarray(entry["intrinsic"], jnp.float32),
                boxes, scales,
            )
        dt = (time.perf_counter() - t0) / max(len(mesh_ids), 1)
        for i, (mesh_id, out) in enumerate(zip(mesh_ids, outs)):
            tco = np.asarray(out.tcos[0])
            results.append(PoseResult(
                scene_id=entry["scene_id"], im_id=entry["frame_id"], obj_id=mesh_id,
                score=float(out.scores[0]), R=tco[:3, :3], t=tco[:3, 3],
                bbox_visib=np.array([boxes[i][0], boxes[i][1],
                                     boxes[i][2] - boxes[i][0], boxes[i][3] - boxes[i][1]]),
                scale=float(scales[i]), time=dt,
            ))

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    write_results_csv(results, args.out, t_scale=1000.0)  # BOP static: mm
    print(f"{len(results)} poses -> {args.out}")
    print(timer.report())


if __name__ == "__main__":
    main()
