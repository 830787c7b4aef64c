"""Precompute monocular metric depth for BOP scenes (16-bit normalized PNGs).

CLI counterpart of reference scripts/generate_depth_zoe.py:14-31: run the
metric depth model on each RGB frame and write depth_pred/*.png normalized to
uint16 (value/2^16-1 at read time, reference bop.py:33-35).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from freepose_tpu.datasets.bop import BOPDataset
from scripts.common import add_shard_args, get_shard, load_params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--weights", default=None, help="converted depth-model params (.npz)")
    ap.add_argument("--max-depth", type=float, default=10.0)
    add_shard_args(ap)
    args = ap.parse_args()

    from freepose_tpu.models.zoedepth import MetricDepthEstimator

    est = MetricDepthEstimator.from_weights(args.weights)
    dataset = BOPDataset(args.dataset, args.split)
    shard = get_shard(args)
    for idx in shard.slice(len(dataset)):
        meta = dataset.frames[idx]
        out_path = Path(meta["rgb_path"]).parent.parent / "depth_pred" / Path(meta["rgb_path"]).name
        if out_path.exists():
            continue
        out_path.parent.mkdir(exist_ok=True)
        entry = dataset[idx]
        depth = est.predict(entry["image"])  # metres [H, W]
        norm = np.clip(depth / args.max_depth, 0, 1)
        from PIL import Image

        Image.fromarray((norm * (2**16 - 1)).astype(np.uint16)).save(out_path)
        print(f"depth {out_path}")


if __name__ == "__main__":
    main()
