"""Multi-object batched refine: estimate_frame == serial per-object estimate.

The reference refines co-tracked objects serially per frame
(dino_inference_video.py:144); estimate_frame fuses all cache-hit objects of
a frame into one dispatch. Parity must be exact across coarse / miss / hit /
mixed frames.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.io.mesh import TriMesh
from freepose_tpu.models.dinov2 import DinoFeatureExtractor, DinoV2Config
from freepose_tpu.ops.rasterizer import RasterSettings
from freepose_tpu.pipeline import fine_cache
from freepose_tpu.pipeline.online_pose_estimator import OnlinePoseEstimator
from freepose_tpu.pipeline.renderer import TemplateRenderer
from freepose_tpu.pipeline.template_bank import TemplateBank

RES = 84
CFG = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56)


def _mesh(seed: int) -> TriMesh:
    rng = np.random.default_rng(seed)
    n_lat, n_lon = 10, 14
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.2 * np.sin((2 + seed % 2) * ph) * np.sin(2 * th)
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


@pytest.fixture(scope="module")
def setup():
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    renderer = TemplateRenderer(
        n_poses=16, resolution=RES, max_vertices=256, max_faces=512,
        settings=RasterSettings(resolution=RES, tile=28, max_faces_per_tile=128),
    )
    bank = TemplateBank(feature_fn, renderer, cache_size=4)
    mk = lambda: OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=8, extractor=fe, feature_layer=2, fine_cache_capacity=16,
    )
    return renderer, bank, mk


def test_estimate_frame_matches_serial(setup, monkeypatch):
    renderer, bank, mk = setup
    est_serial = mk()
    est_batch = mk()
    meshes = [_mesh(0), _mesh(1)]
    packs = [bank.get(f"mo-{i}", m) for i, m in enumerate(meshes)]
    fp = np.asarray(est_serial.fine_poses)

    calls = {"hit": 0, "update": 0}
    orig_hit = fine_cache.cached_refine_hit_multi
    orig_upd = fine_cache.cached_refine_update_multi

    def counting_hit(*a, **kw):
        calls["hit"] += 1
        return orig_hit(*a, **kw)

    def counting_upd(*a, **kw):
        calls["update"] += 1
        return orig_upd(*a, **kw)

    monkeypatch.setattr(fine_cache, "cached_refine_hit_multi", counting_hit)
    monkeypatch.setattr(fine_cache, "cached_refine_update_multi", counting_upd)

    # Per-object grid trajectories: obj0 lingers early (joint hits), then
    # BOTH jump at t=3 (joint misses -> the fused multi update).
    trajs = [[5, 5, 6, 80, 81], [120, 121, 40, 160, 161]]
    prev_s = [None, None]
    prev_b = [None, None]
    for t in range(len(trajs[0])):
        objs_s, objs_b = [], []
        for i in range(2):
            gi = trajs[i][t]
            gt = jnp.asarray(fp[(gi + 1) % len(fp)])
            rgb, depth = renderer.render_from_poses(meshes[i], gt[None])
            props, masks, boxes = renderer.generate_proposals(rgb, depth)
            o = dict(
                proposal=props[0], proposal_mask=masks[0], pack=packs[i],
                mesh=meshes[i], k=renderer.k,
                bbox=boxes[0].astype(jnp.float32), est_scale=0.25,
            )
            objs_s.append(dict(o, prev_pose=prev_s[i]))
            objs_b.append(dict(o, prev_pose=prev_b[i]))

        outs_s = [
            est_serial.estimate(
                o["proposal"], o["proposal_mask"], o["pack"], o["mesh"],
                o["k"], o["bbox"], o["est_scale"], prev_pose=o["prev_pose"],
                neighborhood_deg=40.0, mask_scores=(t % 2 == 1),
            )
            for o in objs_s
        ]
        outs_b = est_batch.estimate_frame(
            objs_b, neighborhood_deg=40.0, mask_scores=(t % 2 == 1), fuse=True
        )
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(outs_b[i].tcos), np.asarray(outs_s[i].tcos),
                rtol=0, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(outs_b[i].scores), np.asarray(outs_s[i].scores),
                rtol=0, atol=1e-5,
            )
            prev_s[i] = outs_s[i].tcos[0]
            prev_b[i] = outs_b[i].tcos[0]
        # NB cache CONTENTS may legitimately diverge between the two paths
        # (the fused miss batch shares one bucket, so smaller-miss objects
        # get extra prefetch) — exact per-view reuse keeps outputs equal
        # regardless, which is what the assertions above pin.

    # Both fused frame paths actually ran.
    assert calls["hit"] >= 1
    assert calls["update"] >= 1


def test_estimate_frame_requires_cache(setup):
    renderer, bank, _ = setup
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    est = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=8, extractor=fe, feature_layer=2, fine_cache_capacity=0,
    )
    with pytest.raises(ValueError):
        est.estimate_frame([])
