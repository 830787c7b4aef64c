"""Zoomed-intrinsics fine rendering (opt-in --zoom-renders).

zoom_intrinsics_for_poses maps each pose's projected-vertex bbox onto the
full canvas with crop_resize_pad's convention, so the render IS the proposal
at native resolution. Checks: (1) geometric agreement with the
render-then-crop baseline, (2) the cached refine stays exact under zoom,
(3) zoomed tracking still locks onto the true pose.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.geometry.crop import crop_resize_pad
from freepose_tpu.geometry.rotation import geodesic_distance
from freepose_tpu.io.mesh import TriMesh
from freepose_tpu.models.dinov2 import DinoFeatureExtractor, DinoV2Config
from freepose_tpu.ops.rasterizer import RasterSettings, render_meshes
from freepose_tpu.pipeline.online_pose_estimator import OnlinePoseEstimator
from freepose_tpu.pipeline.renderer import TemplateRenderer, zoom_intrinsics_for_poses
from freepose_tpu.pipeline.template_bank import TemplateBank

RES = 84
CFG = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56)


def _mesh():
    rng = np.random.default_rng(5)
    n_lat, n_lon = 10, 14
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.2 * np.sin(3 * ph) * np.sin(2 * th)
            verts.append([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph), r * np.cos(th)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    v = np.asarray(verts, np.float32)
    v /= np.abs(v).max()
    return TriMesh(v, np.asarray(faces, np.int32), rng.random((len(v), 3)).astype(np.float32))


@pytest.fixture(scope="module")
def setup():
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    renderer = TemplateRenderer(
        n_poses=16, resolution=RES, max_vertices=256, max_faces=512,
        settings=RasterSettings(resolution=RES, tile=28, max_faces_per_tile=128),
    )
    bank = TemplateBank(feature_fn, renderer, cache_size=2)
    return fe, feature_fn, renderer, bank


def test_zoom_matches_crop_baseline(setup):
    """The zoomed render's silhouette must agree with the baseline
    render-then-crop silhouette (IoU high; rasterization-level diffs only)."""
    _, _, renderer, _ = setup
    mesh = _mesh()
    v, c, f, fv = renderer._padded(mesh, 0.25)
    poses = renderer.poses[:6]
    kz = zoom_intrinsics_for_poses(v, f, fv, poses, renderer.k, RES)
    _, depth_z = render_meshes(v, c, f, fv, poses, kz, renderer.settings)
    zoom_masks = np.asarray(depth_z > 0)

    rgb, depth = renderer.render_from_poses(mesh, poses)
    _, masks, boxes = renderer.generate_proposals(rgb, depth)
    crop_masks = np.asarray(
        crop_resize_pad(
            jnp.asarray(masks)[:, None].astype(jnp.float32), boxes, RES
        )[:, 0]
        > 0.5
    )
    for i in range(len(poses)):
        inter = np.logical_and(zoom_masks[i], crop_masks[i]).sum()
        union = np.logical_or(zoom_masks[i], crop_masks[i]).sum()
        assert union > 0 and inter / union > 0.8, f"view {i}: IoU {inter/union:.2f}"
        # Zoom fills the canvas: the mask must touch (near) the border.
        ys, xs = np.nonzero(zoom_masks[i])
        span = max(xs.max() - xs.min(), ys.max() - ys.min())
        assert span >= RES - 4


def test_zoom_cached_equals_uncached(setup):
    """Fine-cache exactness must hold in zoom mode too."""
    fe, feature_fn, renderer, bank = setup
    mesh = _mesh()
    pack = bank.get("zoom-blob", mesh)
    mk = lambda cap: OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=8, extractor=fe, feature_layer=2, fine_cache_capacity=cap,
        zoom_renders=True,
    )
    est_u, est_c = mk(0), mk(12)
    fp = np.asarray(est_u.fine_poses)
    for gi in [5, 6, 5, 120, 5]:
        prev = jnp.asarray(fp[gi])
        gt = jnp.asarray(fp[(gi + 1) % len(fp)])
        rgb, depth = renderer.render_from_poses(mesh, gt[None])
        props, masks, boxes = renderer.generate_proposals(rgb, depth)
        args = dict(
            k=renderer.k, bbox=boxes[0].astype(jnp.float32), est_scale=0.25,
            neighborhood_deg=40.0,
        )
        o_u = est_u.estimate(props[0], masks[0], pack, mesh, prev_pose=prev, **args)
        o_c = est_c.estimate(props[0], masks[0], pack, mesh, prev_pose=prev, **args)
        np.testing.assert_allclose(
            np.asarray(o_c.tcos), np.asarray(o_u.tcos), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(o_c.scores), np.asarray(o_u.scores), rtol=0, atol=1e-5
        )


def test_zoom_tracking_locks_on(setup):
    """With the query rendered at a grid pose, zoomed refine must select a
    nearby grid pose (the matching signal survives the render-domain change)."""
    fe, feature_fn, renderer, bank = setup
    mesh = _mesh()
    pack = bank.get("zoom-blob2", mesh)
    est = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=8, extractor=fe, feature_layer=2, fine_cache_capacity=16,
        zoom_renders=True,
    )
    fp = np.asarray(est.fine_poses)
    for gi in [40, 41, 42]:
        gt = jnp.asarray(fp[gi])
        rgb, depth = renderer.render_from_poses(mesh, gt[None])
        props, masks, boxes = renderer.generate_proposals(rgb, depth)
        out = est.estimate(
            props[0], masks[0], pack, mesh, k=renderer.k,
            bbox=boxes[0].astype(jnp.float32), est_scale=0.25,
            prev_pose=gt, neighborhood_deg=40.0,
        )
        err = float(
            geodesic_distance(
                jnp.asarray(out.tcos)[0, :3, :3][None], gt[:3, :3]
            )[0]
        )
        assert np.isfinite(err) and err < 45.0


def test_zoom_refine_sharded_matches_single_device(setup):
    """zoom + shard_mesh composition (uncached): the sharded per-pose-K
    renders + features reassemble to the single-device zoom refine."""
    import jax
    from freepose_tpu.parallel.mesh import make_mesh

    fe, feature_fn, renderer, bank = setup
    est = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=8, extractor=fe, feature_layer=2, zoom_renders=True,
    )
    mesh = _mesh()
    rgb, depth = renderer.render_from_poses(mesh, est.fine_poses[7][None], scale=0.25)
    props, masks, boxes = renderer.generate_proposals(rgb, depth)
    qf = est.coarse.query_features(props[0])
    args = (qf, masks[0], mesh, renderer.k, boxes[0].astype(jnp.float32), 0.25,
            est.fine_poses[7])
    dev_mesh = make_mesh(data=1, model=len(jax.devices()))
    a = est.refine(*args, neighborhood_deg=40.0)
    b = est.refine_sharded(*args, device_mesh=dev_mesh, neighborhood_deg=40.0)
    np.testing.assert_allclose(np.asarray(a.tcos), np.asarray(b.tcos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores), atol=1e-5)
    assert int(a.view_indices) == int(b.view_indices)


def test_zoom_cached_sharded_composes(setup):
    """zoom + fine cache + shard_mesh: the full triple composition tracks the
    cache-only zoom path exactly (miss cold work fans over the mesh under
    per-pose zoomed intrinsics; buffers replicated)."""
    import jax
    from freepose_tpu.parallel.mesh import make_mesh

    fe, feature_fn, renderer, bank = setup
    mesh = _mesh()
    pack = bank.get("zoom-blob3", mesh)
    dev_mesh = make_mesh(data=1, model=len(jax.devices()))
    mk = lambda shard: OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=8, extractor=fe, feature_layer=2, fine_cache_capacity=12,
        zoom_renders=True, shard_mesh=shard,
    )
    est_c, est_s = mk(None), mk(dev_mesh)
    fp = np.asarray(est_c.fine_poses)
    for t, gi in enumerate([5, 6, 5, 120, 121, 5]):
        prev = jnp.asarray(fp[gi])
        gt = jnp.asarray(fp[(gi + 1) % len(fp)])
        rgb, depth = renderer.render_from_poses(mesh, gt[None])
        props, masks, boxes = renderer.generate_proposals(rgb, depth)
        args = dict(
            k=renderer.k, bbox=boxes[0].astype(jnp.float32), est_scale=0.25,
            neighborhood_deg=40.0, mask_scores=(t % 2 == 1),
        )
        o_c = est_c.estimate(props[0], masks[0], pack, mesh, prev_pose=prev, **args)
        o_s = est_s.estimate(props[0], masks[0], pack, mesh, prev_pose=prev, **args)
        assert int(o_c.view_indices) == int(o_s.view_indices), f"frame {t}"
        np.testing.assert_allclose(np.asarray(o_s.tcos), np.asarray(o_c.tcos), atol=1e-5)
        np.testing.assert_allclose(np.asarray(o_s.scores), np.asarray(o_c.scores), atol=1e-5)
