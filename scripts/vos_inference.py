"""Semi-supervised VOS: propagate first-frame GT masks through a video.

CLI counterpart of the reference's vendored SAM2 VOS runner
(segment-anything-2/tools/vos_inference.py): seed the video tracker with the
first frame's GT mask(s), propagate, write per-frame PNG masks, and
optionally report J&F against GT masks when provided.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from freepose_tpu.evaluation.vos_metrics import track_j_and_f
from scripts.dino_inference_video import load_frames
from scripts.extract_proposals_ground_video import load_video_predictor


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video-dir", required=True)
    ap.add_argument("--first-mask", required=True, help="first-frame mask PNG (one object)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--gt-dir", default=None, help="per-frame GT mask PNGs for J&F")
    ap.add_argument("--sam2-weights", default=None)
    args = ap.parse_args()
    from PIL import Image

    frames = load_frames(args.video_dir)
    first = np.asarray(Image.open(args.first_mask)) > 0
    ys, xs = np.nonzero(first)
    if len(ys) == 0:
        raise SystemExit("empty first-frame mask")
    box = np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float64)

    predictor = load_video_predictor(args)
    state = predictor.init_state(frames)
    state = predictor.add_new_points_or_box(state, 0, obj_id=0, box=box)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    preds = []
    for t, _, _, high in predictor.propagate_in_video(state, binarize=True):
        mask = high[0]
        preds.append(mask)
        Image.fromarray((mask * 255).astype(np.uint8)).save(out / f"{t:06d}.png")
    print(f"propagated {len(preds)} masks -> {out}")

    if args.gt_dir:
        gt_paths = sorted(Path(args.gt_dir).glob("*.png"))
        gts = np.stack([np.asarray(Image.open(p)) > 0 for p in gt_paths[: len(preds)]])
        scores = track_j_and_f(np.stack(preds), gts)
        print(json.dumps(scores))


if __name__ == "__main__":
    main()
