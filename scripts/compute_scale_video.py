"""Metric scale estimation for video proposals (CLIP prior + depth median).

CLI counterpart of reference scripts/compute_scale_video.py: per-frame CLIP
prior lookup plus per-frame metric depth, then a per-object median over
frames (:89-95) -> proposals with `scale`.
"""
from __future__ import annotations

import argparse
from collections import defaultdict
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.camera import default_video_intrinsics
from freepose_tpu.io.proposals_json import (
    load_proposals,
    proposal_bbox_xyxy,
    proposal_mask,
    save_proposals,
)
from freepose_tpu.pipeline.proposals import extract_proposals
from freepose_tpu.pipeline.scale_estimator import ClipPriorScaleEstimator, depth_scales
from scripts.common import load_params
from scripts.compute_scale import load_clip, simple_tokenizer
from scripts.dino_inference_video import load_frames


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video-dir", required=True)
    ap.add_argument("--proposals", required=True)
    ap.add_argument("--scale-file", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--clip-weights", default=None)
    ap.add_argument("--depth-weights", default=None, help="metric depth params; omit to skip depth correction")
    ap.add_argument("--bpe-vocab", default=None)
    ap.add_argument("--query-k", type=int, default=11)
    args = ap.parse_args()

    frames = load_frames(args.video_dir)
    h, w = frames.shape[1:3]
    k = np.asarray(default_video_intrinsics(w, h))
    props = load_proposals(args.proposals)
    clip = load_clip(args.clip_weights)
    if args.bpe_vocab:
        from freepose_tpu.models.tokenizer import ClipTokenizer

        tokenize = ClipTokenizer(args.bpe_vocab, context_length=clip.config.context_length)
    else:
        tokenize = simple_tokenizer(clip.config.vocab_size, clip.config.context_length)
    est = ClipPriorScaleEstimator(clip, tokenize, scale_file=args.scale_file, query_k=args.query_k)

    depth_est = None
    if args.depth_weights is not None:
        from freepose_tpu.models.zoedepth import MetricDepthEstimator

        depth_est = MetricDepthEstimator.from_weights(args.depth_weights)

    per_object: dict = defaultdict(list)
    for p in props:
        f = p["image_id"]
        mask = proposal_mask(p)
        bbox = proposal_bbox_xyxy(p).astype(np.float32)
        prop = extract_proposals(
            jnp.asarray(frames[f]), jnp.asarray(mask[None]), jnp.asarray(bbox[None]),
            target_size=clip.config.image_size, bbox_extend=0.0,
        )
        prior = float(est.estimate(prop)[0])
        if depth_est is not None:
            depth = depth_est.predict(frames[f])
            d_scale = float(depth_scales(
                jnp.asarray(depth), jnp.asarray(k, jnp.float32), jnp.asarray(mask[None])
            )[0])
            # Per-frame prior/depth pairing; median correction over the track.
            per_object[p.get("track_id", p["mesh"])].append((prior, d_scale))
        else:
            per_object[p.get("track_id", p["mesh"])].append((prior, None))

    scale_per_object = {}
    for key, pairs in per_object.items():
        priors = np.array([a for a, _ in pairs])
        if pairs[0][1] is not None:
            depths = np.array([d for _, d in pairs])
            corr = np.median(priors / np.maximum(depths, 1e-9))
            scale_per_object[key] = float(np.median(depths * corr))
        else:
            scale_per_object[key] = float(np.median(priors))

    for p in props:
        p["scale"] = scale_per_object[p.get("track_id", p["mesh"])]
    out = args.out or str(Path(args.proposals).with_suffix("")) + "_gpt4_scaled.json"
    save_proposals(props, out)
    print(f"scaled video proposals -> {out}")


if __name__ == "__main__":
    main()
