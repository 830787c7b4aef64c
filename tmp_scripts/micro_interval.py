"""Micro-bench the smooth interval components on the TPU (warm timings)."""
import time, os, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses as dc
from freepose_tpu.models.cotracker import COTRACKER_TEST, PointTracker
from freepose_tpu.models.dinov2 import VIT_B14_REG, DinoFeatureExtractor
from freepose_tpu.ops.rasterizer import RasterSettings
from freepose_tpu.pipeline.tracking_refiner import TrackingRefiner
from freepose_tpu.io.mesh import TriMesh

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
frames_dev = jax.device_put(rng.integers(0,255,size=(16,h,w,3),dtype=np.uint8))
pose = np.eye(4, dtype=np.float32); pose[2,3] = 1.0
pose_j = jnp.asarray(pose)

def t(fn, n=3, label=""):
    fn()  # warm/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    print(f"{label}: {1e3*float(np.median(ts)):.1f} ms", flush=True)

# 1. correspondences (fused single)
def corr():
    q,s,vv = refiner.compute_2d3d_correspondences(mesh, jnp.zeros((3,2,2)), k, pose_j, fetch=False)
    jax.block_until_ready(vv)
t(corr, label="correspondences(1)")

# 2. order/top-cap + gather of 12 frames
q,s,vv = refiner.compute_2d3d_correspondences(mesh, jnp.zeros((3,2,2)), k, pose_j, fetch=False)
g2 = vv.shape[0]
def sel():
    order = jnp.argsort(jnp.where(vv, 0, g2+1) + jnp.arange(g2))[:512]
    out = (q[order], s[order], vv[order])
    jax.block_until_ready(out[0])
t(sel, label="top-cap select")
idxs = jnp.asarray(np.arange(12, dtype=np.int32))
def gather():
    sub = jnp.take(frames_dev, idxs, axis=0)
    jax.block_until_ready(sub)
t(gather, label="12-frame gather")

sub = jnp.take(frames_dev, idxs, axis=0)
qs = jnp.asarray(rng.uniform(100, 600, size=(512,2)).astype(np.float32))
td = refiner.tracker.track_device
def chain():
    tr, sc = td(sub, qs, 0)
    jax.block_until_ready(sc)
t(chain, label="ZNCC chain 12f x512pts")

tr, sc = td(sub, qs, 0)
tr_np, sc_np = np.asarray(tr), np.asarray(sc)
surf = np.asarray(s[:512] if hasattr(s, 'shape') else s)[:512]
valid = np.ones((12,512), bool)
def pnp():
    refiner.compute_pnp_batch(jnp.asarray(tr_np), jnp.asarray(surf), jnp.asarray(valid), k)
t(pnp, label="EPnP batch (host)")

# fetch cost
def fetch():
    tr, sc = td(sub, qs, 0)
    np.asarray(tr); np.asarray(sc)
t(fetch, label="chain+fetch")
