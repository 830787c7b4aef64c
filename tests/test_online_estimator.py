import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.geometry.rotation import geodesic_distance, template_poses
from freepose_tpu.io.mesh import TriMesh
from freepose_tpu.models.dinov2 import DinoFeatureExtractor, DinoV2Config
from freepose_tpu.ops.rasterizer import RasterSettings
from freepose_tpu.pipeline.online_pose_estimator import OnlinePoseEstimator, select_neighborhood
from freepose_tpu.pipeline.renderer import TemplateRenderer
from freepose_tpu.pipeline.template_bank import TemplateBank

RES = 84
CFG = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56)


def _mesh():
    rng = np.random.default_rng(0)
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
    return TriMesh(v, np.asarray(faces, np.int32), rng.random((len(v), 3)).astype(np.float32))


def test_select_neighborhood_static_shapes():
    poses = template_poses(500)
    prev = np.asarray(poses[42])
    sel, idx, mask = select_neighborhood(poses, jnp.asarray(prev), 15.0, 64)
    assert sel.shape == (64, 4, 4) and mask.shape == (64,)
    # The nearest pose is the query itself.
    assert int(idx[0]) == 42
    d = np.asarray(geodesic_distance(sel[:, :3, :3], jnp.asarray(prev[:3, :3])))
    m = np.asarray(mask)
    assert (d[m][1:] < 15.0).all()
    # Distances sorted ascending among selected.
    assert (np.diff(d) >= -1e-3).all()


def test_default_neighbor_cap_covers_15deg_ball():
    """The static n_neighbors=32 default must contain EVERY grid pose within
    15 deg on the production fine grids — 10k (class default, measured max
    13) AND 20k (the reference video CLI's size, dino_inference_video.py:64,
    measured max 22) — otherwise the top-k silently truncates the
    reference's `dists < 15` neighbourhood."""
    rng = np.random.default_rng(1)
    for n, probes in ((10000, 25), (20000, 15)):
        poses = template_poses(n)
        rots = np.asarray(poses[:, :3, :3])
        for i in rng.integers(0, n, size=probes):
            d = np.asarray(geodesic_distance(jnp.asarray(rots), jnp.asarray(rots[i])))
            assert (d < 15.0).sum() <= 32


@pytest.fixture(scope="module")
def setup():
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    renderer = TemplateRenderer(
        n_poses=16, resolution=RES, max_vertices=256, max_faces=512,
        settings=RasterSettings(resolution=RES, tile=28, max_faces_per_tile=128),
    )
    bank = TemplateBank(feature_fn, renderer, cache_size=2)
    est = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200, n_neighbors=32
    )
    return renderer, bank, est


def test_online_refine_converges_to_true_view(setup):
    renderer, bank, est = setup
    mesh = _mesh()
    pack = bank.get("blob2", mesh)
    # Ground truth: a pose from the fine grid, perturbed slightly as "prev".
    gt_pose = np.asarray(est.fine_poses[77])
    rgb, depth = renderer.render_from_poses(mesh, jnp.asarray(gt_pose)[None])
    props, masks, boxes = renderer.generate_proposals(rgb, depth)

    out = est.estimate(
        props[0], masks[0], pack, mesh, renderer.k, boxes[0].astype(jnp.float32),
        est_scale=mesh.half_extent() * 0.25,
        prev_pose=jnp.asarray(est.fine_poses[77]),  # neighbourhood centred at GT
        neighborhood_deg=25.0,
    )
    # The refined rotation must be the GT grid pose (self-retrieval within
    # the neighbourhood).
    ang = float(geodesic_distance(out.tcos[:1, :3, :3], jnp.asarray(gt_pose[:3, :3]))[0])
    assert ang < 1e-3, f"refined pose {ang} deg from GT"
    assert abs(float(out.tcos[0, 2, 3]) - 1.1) < 0.15


def test_online_refine_masked_scores(setup):
    renderer, bank, est = setup
    mesh = _mesh()
    pack = bank.get("blob2", mesh)
    gt_pose = np.asarray(est.fine_poses[10])
    rgb, depth = renderer.render_from_poses(mesh, jnp.asarray(gt_pose)[None])
    props, masks, boxes = renderer.generate_proposals(rgb, depth)
    out = est.estimate(
        props[0], masks[0], pack, mesh, renderer.k, boxes[0].astype(jnp.float32),
        est_scale=0.25, prev_pose=jnp.asarray(gt_pose), neighborhood_deg=25.0,
        mask_scores=True,
    )
    ang = float(geodesic_distance(out.tcos[:1, :3, :3], jnp.asarray(gt_pose[:3, :3]))[0])
    assert ang < 1e-3


def test_online_frame0_runs_coarse(setup):
    renderer, bank, est = setup
    mesh = _mesh()
    pack = bank.get("blob2", mesh)
    rgb, depth = renderer.render(mesh)
    props, masks, boxes = renderer.generate_proposals(rgb, depth)
    out = est.estimate(
        props[2], masks[2], pack, mesh, renderer.k, boxes[2].astype(jnp.float32),
        est_scale=0.25, prev_pose=None, neighborhood_deg=30.0,
    )
    assert out.tcos.shape == (1, 4, 4)
    assert np.isfinite(np.asarray(out.tcos)).all()
    assert float(out.scores[0]) > 0


def test_fused_extractor_path_matches_feature_fn(setup):
    """OnlinePoseEstimator(extractor=...) fuses featurization into the
    prepare program; results must equal the feature_fn path exactly."""
    renderer, bank, est = setup
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    est_fused = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=32, extractor=fe, feature_layer=2,
    )
    est_plain = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200, n_neighbors=32
    )

    mesh = _mesh()
    rgb, depth = renderer.render_from_poses(mesh, est_plain.fine_poses[7][None], scale=0.25)
    props, masks, boxes = renderer.generate_proposals(rgb, depth)
    k = renderer.k
    import jax.numpy as jnp

    qf = est_plain.coarse.query_features(props[0])
    args = (qf, masks[0], mesh, k, boxes[0].astype(jnp.float32), 0.25,
            est_plain.fine_poses[7])
    a = est_plain.refine(*args, neighborhood_deg=25.0)
    b = est_fused.refine(*args, neighborhood_deg=25.0)
    np.testing.assert_allclose(np.asarray(a.tcos), np.asarray(b.tcos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores), atol=1e-5)
    assert int(a.view_indices) == int(b.view_indices)


def test_refine_sharded_matches_single_device(setup):
    """refine_sharded fans the 32 neighbor renders + feature batches over the
    8-device mesh (4 views/device); outputs must equal the fused single-device
    refine."""
    import jax
    from freepose_tpu.parallel.mesh import make_mesh

    renderer, bank, _ = setup
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    est = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=32, extractor=fe, feature_layer=2,
    )
    mesh = _mesh()
    rgb, depth = renderer.render_from_poses(mesh, est.fine_poses[7][None], scale=0.25)
    props, masks, boxes = renderer.generate_proposals(rgb, depth)
    qf = est.coarse.query_features(props[0])
    args = (qf, masks[0], mesh, renderer.k, boxes[0].astype(jnp.float32), 0.25,
            est.fine_poses[7])

    dev_mesh = make_mesh(data=1, model=len(jax.devices()))
    a = est.refine(*args, neighborhood_deg=25.0)
    b = est.refine_sharded(*args, device_mesh=dev_mesh, neighborhood_deg=25.0)
    np.testing.assert_allclose(np.asarray(a.tcos), np.asarray(b.tcos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores), atol=1e-5)
    assert int(a.view_indices) == int(b.view_indices)
    # masked-score variant too (exercises render_masks reassembly)
    am = est.refine(*args, neighborhood_deg=25.0, mask_scores=True)
    bm = est.refine_sharded(
        *args, device_mesh=dev_mesh, neighborhood_deg=25.0, mask_scores=True
    )
    np.testing.assert_allclose(np.asarray(am.scores), np.asarray(bm.scores), atol=1e-5)
    assert int(am.view_indices) == int(bm.view_indices)


def test_refine_sharded_rejects_uneven_split(setup):
    renderer, bank, _ = setup
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    est = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=12, extractor=fe, feature_layer=2,
    )
    from freepose_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="divide evenly"):
        est.refine_sharded(
            jnp.zeros((36, 32)), jnp.zeros((RES, RES), bool), _mesh(),
            renderer.k, jnp.zeros(4), 0.25, est.fine_poses[0],
            device_mesh=make_mesh(data=1, model=8),
        )
