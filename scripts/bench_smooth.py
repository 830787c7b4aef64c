"""Benchmark the track-refine confidence stage (smooth_poses_video hot path).

The reference's dominant smooth_poses cost is render-and-compare inlier
scoring over every frame — a render plus TWO DINOv2 ViT-B passes per frame,
run serially (reference tracking_refiner.py:92-100, SURVEY.md §3.4). Here
the whole stage is batched: one crop/render/feature batch per `--chunk`
frames (TrackingRefiner.pose_confidence_batch). This bench measures
ms/frame of n_inliers_per_pose at production shapes (720p video, 16k-face
mesh, ViT-B/14-reg bf16 @518²) across chunk sizes.

  python -m scripts.bench_smooth             # TPU
  python -m scripts.bench_smooth --tiny      # CPU smoke shapes
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def run_smooth_bench(args) -> dict:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from freepose_tpu.geometry.rotation import template_poses
    from freepose_tpu.io.mesh import TriMesh
    from freepose_tpu.models.cotracker import COTRACKER_TEST, PointTracker
    from freepose_tpu.models.dinov2 import VIT_B14_REG, DinoFeatureExtractor, DinoV2Config
    from freepose_tpu.ops.rasterizer import RasterSettings
    from freepose_tpu.pipeline.tracking_refiner import TrackingRefiner

    rng = np.random.default_rng(0)
    if args.tiny:
        cfg = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56)
        layer = 2
        h, w = 120, 160
        n_lat = n_lon = 12
        max_v, max_f = 512, 1024
        settings = RasterSettings(resolution=518, tile=37, max_faces_per_tile=128)
        n_samples = 500
    else:
        cfg = dataclasses.replace(VIT_B14_REG, dtype=jnp.bfloat16, use_flash=True)
        layer = None
        h, w = 720, 1280
        n_lat = n_lon = 90
        max_v, max_f = 8192, 16384
        settings = RasterSettings(resolution=518, tile=37, max_faces_per_tile=256)
        n_samples = 10000

    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.15 * np.sin(4 * ph) * np.sin(3 * th)
            verts.append([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph), r * np.cos(th)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces += [[a, b, c], [b, d, c]]
    v = np.asarray(verts, np.float32)
    v /= np.abs(v).max() / 0.15
    mesh = TriMesh(v, np.asarray(faces, np.int32), rng.random((len(v), 3)).astype(np.float32))
    print(f"mesh: {len(v)} verts, {len(faces)} faces; platform: {jax.devices()[0].platform}")

    fe = DinoFeatureExtractor(cfg)
    feature_fn = lambda imgs: fe(imgs, layer=layer, feature_type="patch")
    refiner = TrackingRefiner(
        feature_fn=feature_fn,
        tracker=PointTracker(COTRACKER_TEST, mode="correlation"),
        max_vertices=max_v, max_faces=max_f, n_surface_samples=n_samples,
        settings=settings,
        extractor=None if args.no_fused else fe, feature_layer=layer,
    )

    # Synthetic video: random frames (content irrelevant to timing) + a
    # slowly-rotating pose track in front of the camera.
    t = args.frames + args.warmup
    if args.float_frames:
        frames = rng.random((t, 3, h, w)).astype(np.float32)
    else:  # production path: uint8 upload, on-device normalize
        frames = rng.integers(0, 256, size=(t, 3, h, w), dtype=np.uint8)
    k = jnp.asarray([[w * 0.9, 0, w / 2], [0, w * 0.9, h / 2], [0, 0, 1]], jnp.float32)
    grid_poses = np.asarray(template_poses(200, z=0.8))
    poses = grid_poses[rng.integers(0, 200, size=t)]

    out = {}
    for chunk in args.chunks:
        # warm compile
        refiner.n_inliers_per_pose(mesh, frames[:chunk], k, poses[:chunk], chunk=chunk)
        t0 = time.perf_counter()
        inl, thr = refiner.n_inliers_per_pose(
            mesh, frames[args.warmup :], k, poses[args.warmup :], chunk=chunk
        )
        dt = time.perf_counter() - t0
        ms = 1e3 * dt / args.frames
        print(f"chunk={chunk:2d}: {ms:.1f} ms/frame = {1e3 / ms:.2f} frames/s (thr={thr:.3f})")
        out[f"chunk{chunk}_ms"] = ms
    return out


def _parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--warmup", type=int, default=0)
    ap.add_argument("--chunks", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--float-frames", action="store_true",
                    help="upload pre-divided float32 frames (4x the bytes)")
    ap.add_argument("--no-fused", action="store_true",
                    help="eager per-op confidence path instead of the fused program")
    return ap


def main() -> None:
    run_smooth_bench(_parser().parse_args())


if __name__ == "__main__":
    main()
