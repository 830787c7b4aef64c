"""Native C++ host rasterizer: parity with the device (XLA) rasterizer."""
import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.geometry.rotation import template_poses
from freepose_tpu.ops import raster_native
from freepose_tpu.ops.rasterizer import RasterSettings, rasterize

pytestmark = pytest.mark.skipif(
    not raster_native.available(), reason="no C++ toolchain for csrc build"
)

RES = 96


def _mesh():
    rng = np.random.default_rng(0)
    n_lat, n_lon = 12, 16
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.25 * np.sin(3 * ph) * np.sin(2 * th)
            verts.append([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph), r * np.cos(th)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    v = np.asarray(verts, np.float32) * 0.25
    cols = rng.random((len(v), 3)).astype(np.float32)
    return v, np.asarray(faces, np.int32), cols


def _xla_render(v, f, cols, poses, k, res):
    settings = RasterSettings(resolution=res, tile=24, max_faces_per_tile=256, backend="xla")
    rgb, depth = rasterize(
        jnp.asarray(v), jnp.asarray(cols), jnp.asarray(f),
        jnp.ones(f.shape[0], bool), jnp.asarray(poses), jnp.asarray(k), settings,
    )
    return np.asarray(rgb), np.asarray(depth)


def test_native_matches_xla_depth_and_rgb():
    v, f, cols = _mesh()
    poses = np.asarray(template_poses(6), np.float32)
    k = np.array([[140.0, 0, RES / 2], [0, 140.0, RES / 2], [0, 0, 1]], np.float32)

    rgb_x, depth_x = _xla_render(v, f, cols, poses, k, RES)
    rgb_n, depth_n = raster_native.rasterize_native(v, f, poses, k, colors=cols, height=RES)

    hit_x = depth_x > 0
    hit_n = depth_n > 0
    # Coverage: identical up to fp seam pixels (tolerance differences on
    # shared edges) — allow a tiny fraction of disagreement.
    disagree = np.mean(hit_x != hit_n)
    assert disagree < 2e-3, f"coverage disagreement {disagree:.4%}"
    both = hit_x & hit_n
    assert both.any()
    np.testing.assert_allclose(depth_n[both], depth_x[both], rtol=1e-4, atol=1e-5)
    # RGB where both hit (seam pixels may shade the other face of the edge).
    close = np.isclose(rgb_n[both], rgb_x[both], atol=2e-2).all(axis=-1)
    assert close.mean() > 0.995


def test_native_depth_only():
    v, f, _ = _mesh()
    poses = np.asarray(template_poses(2), np.float32)
    k = np.array([[140.0, 0, RES / 2], [0, 140.0, RES / 2], [0, 0, 1]], np.float32)
    rgb, depth = raster_native.rasterize_native(v, f, poses, k, height=RES)
    assert rgb is None
    assert depth.shape == (2, RES, RES)
    assert (depth >= 0).all() and (depth > 0).any()
    # Object sits at z=1.1 with quarter-scale half-extent ~0.3.
    hit = depth[depth > 0]
    assert 0.5 < hit.min() < hit.max() < 2.0


def test_native_empty_when_behind_camera():
    v, f, _ = _mesh()
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0  # behind the camera
    k = np.array([[140.0, 0, RES / 2], [0, 140.0, RES / 2], [0, 0, 1]], np.float32)
    _, depth = raster_native.rasterize_native(v, f, pose[None], k, height=RES)
    assert (depth == 0).all()
