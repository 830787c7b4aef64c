"""Per-mesh per-view FFA retrieval features from template shards.

CLI counterpart of reference scripts/extract_retrieval_features.py: for each
mesh, crop the 600 rendered views, run DINOv2 layer-22 patch features,
mask-average at the 30×30 grid (FFA) or take cls tokens, and write a
[600, D] .npy per mesh.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from freepose_tpu.datasets.template import Prefetcher, WebTemplateDataset
from freepose_tpu.geometry.boxes import mask_to_bbox
from freepose_tpu.geometry.crop import crop_resize_pad
from freepose_tpu.ops.sampling import ffa_pool
from scripts.common import add_shard_args, get_shard, load_dino_extractor, load_filelist

import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wds-dir", required=True)
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--weights", default=None, help="converted DINOv2 params (.npz)")
    ap.add_argument("--layer", type=int, default=22)
    ap.add_argument("--feature-type", choices=["ffa", "cls"], default="ffa")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--meshes-per-task", type=int, default=100)
    add_shard_args(ap)
    args = ap.parse_args()

    names = load_filelist(args.filelist)
    ds = WebTemplateDataset(args.wds_dir, names)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    extractor = load_dino_extractor(args.weights)
    shard = get_shard(args)
    indices = shard.slice(len(ds), chunk=args.meshes_per_task) if args.shard_count else shard.slice(len(ds))

    for item in Prefetcher(ds, indices):
        name = item["model_name"]
        out_path = out_dir / f"{name}.npy"
        if out_path.exists():
            continue
        rgb = jnp.asarray(item["rgb"]).transpose(0, 3, 1, 2)
        masks = jnp.asarray(item["masks"])
        boxes = jax.vmap(mask_to_bbox)(masks)
        crops = crop_resize_pad(rgb, boxes, 420)
        mask_crops = crop_resize_pad(masks[:, None].astype(jnp.float32), boxes, 420)[:, 0] > 0.5
        feats = []
        for i in range(0, crops.shape[0], args.batch_size):
            batch = crops[i : i + args.batch_size]
            if args.feature_type == "cls":
                f = extractor(batch, layer=args.layer, feature_type="cls")
                f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
            else:
                patch = extractor(batch, layer=args.layer, feature_type="patch")
                f = ffa_pool(patch, mask_crops[i : i + args.batch_size], grid=30)
            feats.append(np.asarray(f, np.float32))
        np.save(out_path, np.concatenate(feats))
        print(f"features {name}: {out_path}")


if __name__ == "__main__":
    main()
