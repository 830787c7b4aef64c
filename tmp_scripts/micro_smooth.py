"""Measure smooth_track variants warm on the TPU."""
import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses as dc
from freepose_tpu.models.cotracker import COTRACKER_TEST, PointTracker
from freepose_tpu.models.dinov2 import VIT_B14_REG, DinoFeatureExtractor
from freepose_tpu.ops.rasterizer import RasterSettings
from freepose_tpu.pipeline.tracking_refiner import TrackingRefiner, StreamingInliers
from freepose_tpu.datasets.video import stage_frames_hbm
from freepose_tpu.io.mesh import TriMesh
from scripts.smooth_poses_video import smooth_track

rng = np.random.default_rng(0)
n_lat = n_lon = 90
verts, faces = [], []
for i in range(n_lat + 1):
    th = np.pi * i / n_lat
    for j in range(n_lon):
        ph = 2 * np.pi * j / n_lon
        r = 1.0 + 0.15 * np.sin(4 * ph) * np.sin(3 * th)
        verts.append([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph), r * np.cos(th)])
for i in range(n_lat):
    for j in range(n_lon):
        a = i * n_lon + j; b = i * n_lon + (j + 1) % n_lon
        c = (i + 1) * n_lon + j; d = (i + 1) * n_lon + (j + 1) % n_lon
        faces += [[a, b, c], [b, d, c]]
v = np.asarray(verts, np.float32); v /= np.abs(v).max() / 0.15
mesh = TriMesh(v, np.asarray(faces, np.int32), rng.random((len(v), 3)).astype(np.float32))
cfg = dc.replace(VIT_B14_REG, dtype=jnp.bfloat16, use_flash=True)
fe = DinoFeatureExtractor(cfg)
refiner = TrackingRefiner(
    feature_fn=lambda im: fe(im, layer=None, feature_type="patch"),
    tracker=PointTracker(COTRACKER_TEST, mode="correlation"),
    max_vertices=8192, max_faces=16384, n_surface_samples=10000,
    settings=RasterSettings(resolution=518, tile=37, max_faces_per_tile=256),
    extractor=fe, feature_layer=None,
)
h, w = 720, 1280
k = jnp.asarray([[w*0.9,0,w/2],[0,w*0.9,h/2],[0,0,1]], jnp.float32)
n = 105
frames = rng.integers(0, 255, size=(n, h, w, 3), dtype=np.uint8)
staged = stage_frames_hbm(frames)
poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1)); poses[:, 2, 3] = 1.0
inl = np.arange(n)  # fixed best frame = last; deterministic

def t(label, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    print(f"{label}: {1e3*float(np.median(ts))/n:.2f} ms/frame (total {float(np.median(ts)):.2f}s)", flush=True)

t("batched", lambda: smooth_track(refiner, mesh, staged, k, poses, interval=12, cap=512, inliers=inl, batched_intervals=True))
t("pipelined", lambda: smooth_track(refiner, mesh, staged, k, poses, interval=12, cap=512, inliers=inl, batched_intervals=False))
