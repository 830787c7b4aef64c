"""Metric scale estimation for proposals (static datasets).

CLI counterpart of reference scripts/compute_scale.py: CLIP-embed each
proposal crop, kNN-median against the LLM text-prior table (gpt4/gpt35/
gemma2/llama31 JSON), optionally depth-correct, and write
`*_gpt4_scaled.json` proposals with a `scale` field.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from freepose_tpu.datasets.bop import BOPDataset
from freepose_tpu.io.proposals_json import (
    filter_by_frame,
    load_proposals,
    proposal_bbox_xyxy,
    proposal_mask,
    save_proposals,
)
from freepose_tpu.pipeline.proposals import extract_proposals
from freepose_tpu.pipeline.scale_estimator import ClipPriorScaleEstimator
from scripts.common import load_params


def load_clip(weights: str | None):
    import os

    from freepose_tpu.models.clip import CLIP_TEST, VIT_BIGG_14, ClipFeatureExtractor

    cfg = CLIP_TEST if os.environ.get("FREEPOSE_TINY_MODELS") else VIT_BIGG_14
    return ClipFeatureExtractor(cfg, params=load_params(weights) if weights else None)


def simple_tokenizer(vocab_size: int, length: int):
    """Hash tokenizer fallback when no BPE vocab is provided (deterministic;
    adequate for structure tests — real runs pass --bpe-vocab)."""

    def tok(names):
        out = np.zeros((len(names), length), np.int32)
        for i, n in enumerate(names):
            h = abs(hash(n))
            for j in range(length - 1):
                out[i, j] = 1 + (h >> (j * 3)) % (vocab_size - 2)
            out[i, length - 1] = vocab_size - 1
        return out

    return tok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--proposals", required=True)
    ap.add_argument("--scale-file", required=True, help="LLM prior JSON (e.g. data/gpt4_scales.json)")
    ap.add_argument("--out", default=None, help="defaults to <proposals>_gpt4_scaled.json")
    ap.add_argument("--clip-weights", default=None)
    ap.add_argument("--bpe-vocab", default=None, help="CLIP BPE merges file")
    ap.add_argument("--query-k", type=int, default=11)
    ap.add_argument("--use-depth", action="store_true")
    args = ap.parse_args()

    clip = load_clip(args.clip_weights)
    if args.bpe_vocab:
        from freepose_tpu.models.tokenizer import ClipTokenizer

        tokenize = ClipTokenizer(args.bpe_vocab, context_length=clip.config.context_length)
    else:
        tokenize = simple_tokenizer(clip.config.vocab_size, clip.config.context_length)

    est = ClipPriorScaleEstimator(clip, tokenize, scale_file=args.scale_file, query_k=args.query_k)
    dataset = BOPDataset(args.dataset, args.split)
    props = load_proposals(args.proposals)

    for idx in range(len(dataset)):
        entry = dataset[idx]
        frame_props = filter_by_frame(props, entry["scene_id"], entry["frame_id"])
        if not frame_props:
            continue
        masks = np.stack([proposal_mask(p) for p in frame_props])
        boxes = np.stack([proposal_bbox_xyxy(p) for p in frame_props]).astype(np.float32)
        prop = extract_proposals(
            jnp.asarray(entry["image"]), jnp.asarray(masks), jnp.asarray(boxes),
            target_size=clip.config.image_size, bbox_extend=0.0,
        )
        depth = entry["depth_pred"] if args.use_depth else None
        k = entry["intrinsic"] if args.use_depth else None
        scales = est.estimate(prop, depth, k)
        for p, s in zip(frame_props, scales):
            p["scale"] = float(s)

    out = args.out or str(Path(args.proposals).with_suffix("")) + "_gpt4_scaled.json"
    save_proposals(props, out)
    print(f"scaled proposals -> {out}")


if __name__ == "__main__":
    main()
