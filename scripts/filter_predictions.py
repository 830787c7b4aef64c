"""Pick the tracked object best matching GT bboxes by mean IoU.

CLI counterpart of reference scripts/filter_predictions.py:24-50: for video
proposal JSONs with multiple tracked objects, keep the track whose per-frame
bboxes best overlap the GT bboxes -> `*_best_object.json`.
"""
from __future__ import annotations

import argparse
from collections import defaultdict
from pathlib import Path

import numpy as np

from freepose_tpu.geometry.boxes import bbox_iou
from freepose_tpu.io.proposals_json import load_proposals, save_proposals

import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proposals", required=True)
    ap.add_argument("--gt", required=True, help="video GT .npy (dict with 'bboxes' xywh per frame)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    props = load_proposals(args.proposals)
    gt = np.load(args.gt, allow_pickle=True).item()
    gt_boxes = np.asarray(gt["bboxes"], np.float32)  # [T, 4] xywh

    by_track: dict = defaultdict(list)
    for p in props:
        by_track[p.get("track_id", p["mesh"])].append(p)

    best_track, best_iou = None, -1.0
    for tid, plist in by_track.items():
        ious = []
        for p in plist:
            f = p["image_id"]
            if f < len(gt_boxes):
                ious.append(float(bbox_iou(jnp.asarray(p["bbox"], jnp.float32), jnp.asarray(gt_boxes[f]))))
        mean_iou = float(np.mean(ious)) if ious else 0.0
        if mean_iou > best_iou:
            best_track, best_iou = tid, mean_iou

    kept = by_track[best_track]
    out = args.out or str(Path(args.proposals).with_suffix("")) + "_best_object.json"
    save_proposals(kept, out)
    print(f"kept track {best_track} (mean IoU {best_iou:.3f}, {len(kept)} frames) -> {out}")


if __name__ == "__main__":
    main()
