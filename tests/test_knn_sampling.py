import jax
import jax.numpy as jnp
import numpy as np
import torch

from freepose_tpu.ops.knn import (
    fine_rerank_scores,
    knn_median_lookup,
    topk_search,
    topk_search_sharded,
)
from freepose_tpu.ops.sampling import ffa_pool, resize_bilinear, roi_align
from freepose_tpu.parallel.mesh import make_mesh, shard_bank


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_topk_search_exact():
    rng = np.random.default_rng(0)
    bank = _norm(rng.normal(size=(1000, 64))).astype(np.float32)
    q = _norm(rng.normal(size=(5, 64))).astype(np.float32)
    s, i = topk_search(jnp.asarray(bank), jnp.asarray(q), 7)
    ref = q @ bank.T
    ref_i = np.argsort(-ref, axis=1)[:, :7]
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(np.asarray(s), np.take_along_axis(ref, ref_i, 1), atol=1e-5)


def test_topk_search_sharded_matches_single():
    rng = np.random.default_rng(1)
    bank = _norm(rng.normal(size=(1024, 32))).astype(np.float32)
    q = _norm(rng.normal(size=(6, 32))).astype(np.float32)
    mesh = make_mesh(1, 8)
    bank_sharded = shard_bank(jnp.asarray(bank), mesh)
    s_sh, i_sh = topk_search_sharded(bank_sharded, jnp.asarray(q), 9, mesh)
    s_ref, i_ref = topk_search(jnp.asarray(bank), jnp.asarray(q), 9)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))


def test_fine_rerank_scores():
    rng = np.random.default_rng(2)
    fine = _norm(rng.normal(size=(10, 20, 16))).astype(np.float32)
    q = _norm(rng.normal(size=(16,))).astype(np.float32)
    got = np.asarray(fine_rerank_scores(jnp.asarray(fine), jnp.asarray(q), topk=5))
    ref = np.sort(fine @ q, axis=1)[:, -5:].mean(axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_knn_median_lookup():
    rng = np.random.default_rng(3)
    bank = _norm(rng.normal(size=(50, 8))).astype(np.float32)
    vals = rng.random(50).astype(np.float32)
    q = bank[[7, 21]]  # queries identical to bank rows
    got = np.asarray(knn_median_lookup(jnp.asarray(bank), jnp.asarray(vals), jnp.asarray(q), k=5))
    # Reference via numpy cosine KNN:
    for qi, g in zip([7, 21], got):
        idx = np.argsort(-(bank @ bank[qi]))[:5]
        assert g == np.median(vals[idx])


def test_ffa_pool_matches_manual():
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(2, 9, 12)).astype(np.float32)  # 3x3 grid
    masks = np.zeros((2, 30, 30), bool)
    masks[0, :10, :10] = True  # top-left cell only
    masks[1, :, :] = True
    out = np.asarray(ffa_pool(jnp.asarray(feats), jnp.asarray(masks), grid=3))
    ref0 = _norm(feats[0, 0:1].mean(0, keepdims=True))[0]
    ref1 = _norm(feats[1].mean(0, keepdims=True))[0]
    np.testing.assert_allclose(out[0], ref0, atol=1e-5)
    np.testing.assert_allclose(out[1], ref1, atol=1e-5)


def test_ffa_pool_empty_mask_fallback():
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(1, 9, 4)).astype(np.float32)
    masks = np.zeros((1, 30, 30), bool)
    out = np.asarray(ffa_pool(jnp.asarray(feats), jnp.asarray(masks), grid=3))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], _norm(feats[0].mean(0, keepdims=True))[0], atol=1e-5)


def test_resize_bilinear_matches_torch():
    rng = np.random.default_rng(6)
    img = rng.random((2, 17, 23)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (30, 30)))
    ref = torch.nn.functional.interpolate(
        torch.tensor(img)[None], size=(30, 30), mode="bilinear"
    )[0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _roi_align_oracle(img, boxes, oh, ow, s=2):
    """Slow spec-level roi_align oracle (aligned=False): s*s bilinear samples
    per bin, averaged; out-of-range samples contribute 0."""
    c, h, w = img.shape

    def bsample(y, x):
        if y <= -1.0 or y >= h or x <= -1.0 or x >= w:
            return np.zeros(c, img.dtype)
        y, x = min(max(y, 0.0), h - 1), min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        wy, wx = y - y0, x - x0
        return (img[:, y0, x0] * (1 - wy) * (1 - wx) + img[:, y0, x1] * (1 - wy) * wx
                + img[:, y1, x0] * wy * (1 - wx) + img[:, y1, x1] * wy * wx)

    out = np.zeros((len(boxes), c, oh, ow), img.dtype)
    for n, (x1, y1, x2, y2) in enumerate(boxes):
        bh, bw = (y2 - y1) / oh, (x2 - x1) / ow
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(c, img.dtype)
                for si in range(s):
                    for sj in range(s):
                        y = y1 + (i + (si + 0.5) / s) * bh
                        x = x1 + (j + (sj + 0.5) / s) * bw
                        acc += bsample(y, x)
                out[n, :, i, j] = acc / (s * s)
    return out


def test_roi_align_matches_oracle():
    rng = np.random.default_rng(7)
    img = rng.random((3, 40, 50)).astype(np.float32)
    boxes = np.array([[5.0, 5.0, 30.0, 25.0], [-10.0, 2.0, 60.0, 45.0]], np.float32)
    ours = np.asarray(roi_align(jnp.asarray(img), jnp.asarray(boxes), 14, 14, sampling_ratio=2))
    ref = _roi_align_oracle(img, boxes, 14, 14, s=2)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_roi_align_sampling_ratios_and_tiny_box():
    """The separable two-matmul formulation must match the per-tap spec at
    every sampling ratio and for sub-pixel boxes."""
    rng = np.random.default_rng(8)
    img = rng.random((2, 31, 23)).astype(np.float32)
    boxes = np.array(
        [[3.2, 4.1, 19.7, 27.3], [10.0, 10.0, 10.4, 10.6], [15.0, -5.0, 40.0, 20.0]],
        np.float32,
    )
    for s in (1, 2, 3):
        ours = np.asarray(roi_align(jnp.asarray(img), jnp.asarray(boxes), 7, 9, sampling_ratio=s))
        ref = _roi_align_oracle(img, boxes, 7, 9, s=s)
        np.testing.assert_allclose(ours, ref, atol=1e-4, err_msg=f"s={s}")


def test_topk_search_sharded_uneven_bank():
    """Realistic bank sizes (46,037 rows) don't divide by the mesh — padding
    must keep results exact."""
    rng = np.random.default_rng(9)
    n = 1021  # prime, not divisible by 8
    bank = _norm(rng.normal(size=(n, 32))).astype(np.float32)
    q = _norm(rng.normal(size=(4, 32))).astype(np.float32)
    mesh = make_mesh(1, 8)
    bank_sharded = shard_bank(jnp.asarray(bank), mesh)
    s_sh, i_sh = topk_search_sharded(bank_sharded, jnp.asarray(q), 11, mesh)
    s_ref, i_ref = topk_search(jnp.asarray(bank), jnp.asarray(q), 11)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))


def test_retrieve_topk_fused_matches_op_sequence():
    """Fused per-frame retrieval (crops + DINOv2 + FFA + bank top-k in one
    program, count padded to a power of two) must equal the separate-op
    sequence for both feature types."""
    from freepose_tpu.models.dinov2 import DinoFeatureExtractor, DinoV2Config
    from freepose_tpu.pipeline.proposals import extract_proposals, retrieve_topk
    from freepose_tpu.pipeline.template_bank import normalize_feats

    rng = np.random.default_rng(0)
    cfg = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56)
    fe = DinoFeatureExtractor(cfg)
    h, w, res = 96, 128, 84
    image = jnp.asarray(rng.random((h, w, 3)).astype(np.float32))
    masks = np.zeros((3, h, w), bool)
    masks[0, 20:60, 30:80] = True
    masks[1, 5:40, 60:120] = True
    masks[2, 50:90, 5:50] = True
    boxes = jnp.asarray(np.array(
        [[30, 20, 80, 60], [60, 5, 120, 40], [5, 50, 50, 90]], np.float32))
    bank = rng.standard_normal((64, 32)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    bank = jnp.asarray(bank)

    for ftype in ("ffa", "cls"):
        s_f, i_f, feats_f = retrieve_topk(
            image, jnp.asarray(masks), boxes, bank, fe, layer=2,
            feature_type=ftype, k=7, target_size=res, bbox_extend=0.1,
        )
        prop = extract_proposals(image, jnp.asarray(masks), boxes, res, 0.1)
        if ftype == "cls":
            feats = normalize_feats(fe(prop.proposals, layer=2, feature_type="cls"))
        else:
            patch = fe(prop.proposals, layer=2, feature_type="patch")
            feats = ffa_pool(patch, prop.masks, grid=res // 14)
        s_r, i_r = topk_search(bank, feats, 7)
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_r))
        np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(feats_f), np.asarray(feats), atol=1e-5)
        assert s_f.shape == (3, 7)


def test_roi_align_randomized_sweep():
    """Randomized boxes (including degenerate and far out-of-bounds) against
    the per-tap oracle — guards the separable reformulation broadly."""
    rng = np.random.default_rng(11)
    img = rng.random((2, 29, 37)).astype(np.float32)
    for trial in range(10):
        x1, y1 = rng.uniform(-20, 30, 2)
        w, h = rng.uniform(0.01, 60, 2)
        boxes = np.array([[x1, y1, x1 + w, y1 + h]], np.float32)
        ours = np.asarray(roi_align(jnp.asarray(img), jnp.asarray(boxes), 5, 6, sampling_ratio=2))
        ref = _roi_align_oracle(img, boxes, 5, 6, s=2)
        np.testing.assert_allclose(ours, ref, atol=1e-4, err_msg=f"trial {trial} box {boxes}")
