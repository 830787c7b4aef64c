"""Visualize DINOv2 patch features as PCA-RGB panels.

CLI wrapper over freepose_tpu.utils.viz.feature_panel — the reference exposes
this only as a library helper (src/pipeline/refiner_utils.py:63-89 show_feats,
called from notebooks); here it is a first-class observability script:

  python -m scripts.vis_features --images imgs/*.jpg --out feats/ \
      [--weights dinov2_l.npz] [--layer 22] [--masks masks/]

Each input image is resized to the model square, featurized once on device,
and written as `image | PCA(feats) [| mask | PCA(masked feats)]`.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from scripts.common import load_dino_extractor


def main() -> None:
    import jax.numpy as jnp
    from PIL import Image

    from freepose_tpu.ops.sampling import resize_bilinear
    from freepose_tpu.utils.viz import feature_panel

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", nargs="+", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--model", default="vitl", choices=["vitl", "vitb"])
    ap.add_argument("--layer", type=int, default=22)
    ap.add_argument("--masks", default=None, help="dir of per-image binary PNG masks (same stem)")
    args = ap.parse_args()

    fe = load_dino_extractor(args.weights, args.model)
    size = fe.config.image_size
    patch = fe.config.patch_size
    grid = size // patch
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    for path in args.images:
        img = np.asarray(Image.open(path).convert("RGB"))
        square = np.asarray(
            resize_bilinear(jnp.asarray(img, jnp.float32).transpose(2, 0, 1), (size, size))
        ).transpose(1, 2, 0)
        feats = fe(jnp.asarray(square.transpose(2, 0, 1))[None] / 255.0,
                   layer=args.layer, feature_type="patch")[0]
        feats = np.asarray(feats, np.float32).reshape(grid, grid, -1)
        mask = None
        if args.masks:
            mpath = Path(args.masks) / (Path(path).stem + ".png")
            if mpath.exists():
                m = np.asarray(Image.open(mpath).convert("L").resize((grid, grid), Image.NEAREST))
                mask = m > 127
        panel = feature_panel(square.astype(np.uint8), feats, mask=mask, patch=patch)
        dst = out / (Path(path).stem + "_feats.png")
        Image.fromarray(panel).save(dst)
        print(f"{path} -> {dst}")


if __name__ == "__main__":
    main()
