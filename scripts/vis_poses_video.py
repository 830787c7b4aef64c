"""Overlay estimated 6D poses onto video frames via the TPU rasterizer.

CLI counterpart of reference scripts/vis_poses_video.py:106-121 (pyrender
pose overlay with outline + depth ordering): renders the mesh at each frame's
pose with the synthetic video intrinsics and alpha-blends it over the frame,
with a silhouette outline.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.camera import default_video_intrinsics
from freepose_tpu.io.bop_csv import read_results_csv
from freepose_tpu.io.mesh import load_obj, pad_mesh
from freepose_tpu.ops.rasterizer import RasterSettings, rasterize
from scripts.dino_inference_video import load_frames


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video-dir", required=True)
    ap.add_argument("--poses", required=True)
    ap.add_argument("--mesh-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--alpha", type=float, default=0.6)
    ap.add_argument("--render-size", type=int, default=480)
    args = ap.parse_args()
    from PIL import Image

    frames = load_frames(args.video_dir)
    h, w = frames.shape[1:3]
    results = read_results_csv(args.poses, t_scale=1.0)
    results.sort(key=lambda r: r.im_id)
    mesh_id = results[0].obj_id
    mesh = load_obj(Path(args.mesh_dir) / mesh_id / f"{mesh_id}.obj").normalized().scaled(results[0].scale)
    v, c, f, valid = pad_mesh(mesh, 16384, 32768)

    # Render at a reduced square size for speed, scaled intrinsics.
    size = args.render_size
    k_full = np.asarray(default_video_intrinsics(w, h))
    scale = size / max(h, w)
    k = jnp.asarray(k_full * np.array([[scale], [scale], [1]]), jnp.float32)
    setts = RasterSettings(resolution=size, tile=32, max_faces_per_tile=256)

    poses = jnp.asarray(np.stack([
        np.vstack([np.hstack([r.R, r.t[:, None]]), [0, 0, 0, 1]]) for r in results
    ]), jnp.float32)
    rgb, depth = rasterize(jnp.asarray(v), jnp.asarray(c), jnp.asarray(f), jnp.asarray(valid), poses, k, setts)
    rgb, depth = np.asarray(rgb), np.asarray(depth)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for r, render, d in zip(results, rgb, depth):
        frame = frames[r.im_id].astype(np.float32) / 255.0
        # Upscale render mask/colors to frame size.
        from freepose_tpu.ops.sampling import resize_bilinear

        rend = np.asarray(resize_bilinear(jnp.asarray(render).transpose(2, 0, 1), (h, w))).transpose(1, 2, 0)
        mask = np.asarray(resize_bilinear(jnp.asarray((d > 0).astype(np.float32)), (h, w))) > 0.5
        over = frame.copy()
        over[mask] = (1 - args.alpha) * frame[mask] + args.alpha * rend[mask]
        # Outline: mask boundary (dilation minus mask).
        shifted = np.zeros_like(mask)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifted |= np.roll(mask, (dy, dx), axis=(0, 1))
        over[shifted & ~mask] = (0.1, 1.0, 0.1)
        Image.fromarray((over * 255).astype(np.uint8)).save(out / f"{r.im_id:06d}.jpg")
    print(f"overlays -> {out}")


if __name__ == "__main__":
    main()
