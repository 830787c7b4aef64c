"""Integration: template bank + coarse pose estimator on a synthetic mesh.

Self-retrieval sanity: querying with one of the rendered template views must
score that view highest, and the z-lift must recover the render depth when
est_scale equals the true object scale.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.geometry.boxes import mask_to_bbox
from freepose_tpu.io.mesh import TriMesh
from freepose_tpu.models.dinov2 import DinoFeatureExtractor, DinoV2Config
from freepose_tpu.ops.rasterizer import RasterSettings
from freepose_tpu.pipeline.pose_estimator import CoarsePoseEstimator
from freepose_tpu.pipeline.renderer import TemplateRenderer
from freepose_tpu.pipeline.proposals import extract_proposals
from freepose_tpu.pipeline.template_bank import TemplateBank

RES = 84  # tiny renders; f scales to keep reference FOV
CFG = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56)


def _mesh():
    rng = np.random.default_rng(0)
    # Random blob: icosphere-ish point set triangulated crudely via a cube
    # subdivision is overkill — reuse parametric sphere with color texture.
    n_lat, n_lon = 10, 14
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.15 * np.sin(3 * ph) * np.sin(2 * th)
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
    colors = rng.random((len(v), 3)).astype(np.float32)
    return TriMesh(v, np.asarray(faces, np.int32), colors)


@pytest.fixture(scope="module")
def setup():
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    renderer = TemplateRenderer(
        n_poses=24, resolution=RES, max_vertices=256, max_faces=512,
        settings=RasterSettings(resolution=RES, tile=28, max_faces_per_tile=128),
    )
    bank = TemplateBank(feature_fn, renderer, cache_size=2)
    est = CoarsePoseEstimator(feature_fn, bank, n_poses=24)
    return fe, renderer, bank, est


def test_template_pack_shapes(setup):
    _, renderer, bank, _ = setup
    pack = bank.get("blob", _mesh())
    assert pack.feats.shape == (24, 36, 32)  # 84/14=6 -> 36 patches
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(pack.feats, axis=-1)), 1.0, atol=1e-3
    )
    assert pack.pc_min.shape == (24, 3)
    # Template clouds hover around z=1.1 at render scale 0.25.
    assert np.all(np.asarray(pack.pc_mean[:, 2]) > 0.7)
    assert np.all(np.asarray(pack.pc_mean[:, 2]) < 1.5)


def test_self_retrieval_top1(setup):
    _, renderer, bank, est = setup
    mesh = _mesh()
    pack = bank.get("blob", mesh)
    rgb, depth = renderer.render(mesh)
    props, masks, boxes = renderer.generate_proposals(rgb, depth)
    hits = 0
    for q in [0, 7, 15]:
        out = est.estimate(props[q], pack, renderer.k, boxes[q].astype(jnp.float32), est_scale=0.25)
        if int(out.view_indices[0]) == q:
            hits += 1
        assert float(out.scores[0]) > float(out.scores[-1]) - 1e-6
    assert hits == 3, "query view must retrieve itself"


def test_z_lift_recovers_render_depth(setup):
    _, renderer, bank, est = setup
    mesh = _mesh()
    pack = bank.get("blob", mesh)
    rgb, depth = renderer.render(mesh)
    props, masks, boxes = renderer.generate_proposals(rgb, depth)
    q = 3
    # est_scale = true half-extent of the rendered object: the mesh has
    # half-extent ~1.15, rendered at 0.25 => ~0.29. With est_scale equal to
    # the render-scale extent the z-lift must recover z ≈ 1.1.
    true_scale = mesh.half_extent() * 0.25
    out = est.estimate(props[q], pack, renderer.k, boxes[q].astype(jnp.float32), est_scale=true_scale)
    z = float(out.tcos[0, 2, 3])
    assert abs(z - 1.1) < 0.12, f"lifted z {z} should be near 1.1"
    # Rotation part is the template rotation itself.
    np.testing.assert_allclose(
        np.asarray(out.tcos[0, :3, :3]), np.asarray(pack.poses[int(out.view_indices[0]), :3, :3]), atol=1e-5
    )


def test_extract_proposals_matches_renderer_crops(setup):
    _, renderer, *_ = setup
    mesh = _mesh()
    rgb, depth = renderer.render(mesh)
    masks = depth > 0
    boxes = jax.vmap(mask_to_bbox)(masks).astype(jnp.float32)
    props = extract_proposals(rgb[0], masks[:1], boxes[:1], target_size=RES, bbox_extend=0.0)
    assert props.proposals.shape == (1, 3, RES, RES)
    assert props.masks.shape == (1, RES, RES)
    # Masked crop occupies more of the frame than the original view.
    assert float(props.masks[0].mean()) > float(masks[0].mean())


def test_bank_lru_and_disk_cache(tmp_path, setup):
    fe, renderer, _, _ = setup
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    bank = TemplateBank(feature_fn, renderer, cache_size=1, cache_dir=tmp_path)
    mesh = _mesh()
    p1 = bank.get("a", mesh)
    assert (tmp_path / "a.npz").exists()
    bank.get("b", mesh)  # evicts "a" from RAM
    assert "a" not in bank.cache
    p1_again = bank.get("a")  # loads from disk, no mesh needed
    np.testing.assert_allclose(np.asarray(p1.feats), np.asarray(p1_again.feats), atol=2e-3)


def test_estimate_batch_matches_serial(setup):
    """estimate_batch (one ViT batch per frame) must equal per-proposal
    estimate() for every proposal, including distinct packs."""
    _, renderer, bank, est = setup
    mesh_a, mesh_b = _mesh(), _mesh()
    pack_a = bank.get("blob", mesh_a)
    pack_b = bank.get("blob_b", mesh_b)
    rgb, depth = renderer.render(mesh_a)
    props, masks, boxes = renderer.generate_proposals(rgb, depth)
    qs = [1, 5, 9]
    packs = [pack_a, pack_b, pack_a]
    proposals = props[jnp.asarray(qs)]
    bxs = np.asarray(boxes)[qs].astype(np.float32)
    scales = [0.25, 0.3, 0.2]
    batch = est.estimate_batch(proposals, packs, renderer.k, bxs, scales)
    for i, q in enumerate(qs):
        solo = est.estimate(props[q], packs[i], renderer.k, bxs[i], est_scale=scales[i])
        np.testing.assert_allclose(np.asarray(batch[i].tcos), np.asarray(solo.tcos), atol=1e-5)
        np.testing.assert_allclose(np.asarray(batch[i].scores), np.asarray(solo.scores), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(batch[i].view_indices), np.asarray(solo.view_indices))
