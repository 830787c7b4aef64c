"""SAM2 automatic mask generator (grid-prompted whole-image segmentation).

Oracle strategy: NMS and the crop-edge filter check against torchvision /
a numpy transliteration of the published helpers; the generator itself runs
a tiny random-weight SAM2 and is validated on record structure, RLE/box/area
consistency, NMS-duplicate-freedom, and cross-path invariants (crop layers,
m2m, output modes). Reference: automatic_mask_generator.py:36-434.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.geometry.boxes import nms_xyxy
from freepose_tpu.io.rle import decode_rle, rle_area
from freepose_tpu.models.sam2.amg import is_box_near_crop_edge
from freepose_tpu.models.sam2.automatic import Sam2AutomaticMaskGenerator
from freepose_tpu.models.sam2.model import SAM2_TEST, Sam2ImageModel
from freepose_tpu.models.sam2.predictor import Sam2ImagePredictor


@pytest.fixture(scope="module")
def predictor():
    model = Sam2ImageModel(SAM2_TEST)
    img = jnp.zeros((1, 3, 64, 64))
    # init with a mask input so mask_embed params exist (converted released
    # checkpoints always include them; the m2m path needs them)
    params = model.init(
        jax.random.PRNGKey(0), img, mask_inputs=jnp.zeros((1, 1, 16, 16))
    )["params"]
    return Sam2ImagePredictor(SAM2_TEST, params, image_size=64)


def _nms_oracle(boxes, scores, thresh):
    """Sequential transliteration of torchvision.ops.nms (no vectorized IoU
    matrix — an independent implementation style)."""
    order = list(np.argsort(-scores, kind="stable"))
    keep = []
    while order:
        i = order.pop(0)
        keep.append(i)
        rest = []
        for j in order:
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (ai + aj - inter) if (ai + aj - inter) > 0 else 0.0
            if iou <= thresh:
                rest.append(j)
        order = rest
    return np.asarray(keep, np.int64)


def test_nms_matches_oracle():
    rs = np.random.RandomState(0)
    for trial in range(5):
        xy = rs.uniform(0, 50, (40, 2)).astype(np.float32)
        wh = rs.uniform(1, 30, (40, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], axis=1)
        scores = rs.rand(40).astype(np.float32)
        ours = nms_xyxy(boxes, scores, 0.5)
        theirs = _nms_oracle(boxes, scores, 0.5)
        np.testing.assert_array_equal(ours, theirs)
    # degenerate cases
    np.testing.assert_array_equal(nms_xyxy(np.zeros((0, 4)), np.zeros(0), 0.5), np.zeros(0))
    same = np.tile(np.array([[0, 0, 10, 10]], np.float32), (3, 1))
    assert len(nms_xyxy(same, np.array([0.5, 0.9, 0.1]), 0.5)) == 1


def test_is_box_near_crop_edge_oracle():
    # transliteration of reference amg.py:240-254 semantics
    crop_box = [10, 5, 90, 70]
    orig_box = [0, 0, 100, 80]
    boxes = np.array([  # crop-frame coords; uncropped by (+10, +5)
        [2, 30, 50, 50],    # x0 -> 12, |12-10| <= 5 near crop left, far from orig left -> True
        [40, 30, 50, 50],   # interior -> False
        [20, 2, 50, 50],    # y0 -> 7, near crop top 5 but also near orig top 0 (atol 5, |7-0|>5? no: 7>5) -> True
        [15, 20, 78, 50],   # x1 -> 88, near crop right 90, far from orig right 100 -> True
    ], np.float32)
    out = is_box_near_crop_edge(boxes, crop_box, orig_box, atol=5.0)
    # manual oracle
    unc = boxes + np.array([10, 5, 10, 5], np.float32)
    near_crop = np.isclose(unc, np.array(crop_box, np.float32)[None], atol=5.0, rtol=0)
    near_img = np.isclose(unc, np.array(orig_box, np.float32)[None], atol=5.0, rtol=0)
    expect = np.any(near_crop & ~near_img, axis=1)
    np.testing.assert_array_equal(out, expect)
    assert out[0] and not out[1] and out[3]


def _check_records(records, hw):
    h, w = hw
    for r in records:
        assert set(r) == {"segmentation", "area", "bbox", "predicted_iou",
                          "point_coords", "stability_score", "crop_box"}
        seg = r["segmentation"]
        assert seg.shape == (h, w) and seg.dtype == bool
        assert r["area"] == int(seg.sum())
        x, y, bw, bh = r["bbox"]
        if seg.any():
            ys, xs = np.nonzero(seg)
            assert x == xs.min() and y == ys.min()
            assert x + bw == xs.max() and y + bh == ys.max()
        assert 0 <= r["stability_score"] <= 1.0


def test_generate_structure_and_consistency(predictor):
    rng = np.random.default_rng(2)
    image = (rng.random((48, 72, 3)) * 255).astype(np.uint8)
    gen = Sam2AutomaticMaskGenerator(
        predictor, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
    )
    records = gen.generate(image)
    assert len(records) > 0
    _check_records(records, (48, 72))
    # no duplicate pair above the NMS threshold
    if len(records) > 1:
        boxes = np.array([[r["bbox"][0], r["bbox"][1],
                           r["bbox"][0] + r["bbox"][2], r["bbox"][1] + r["bbox"][3]]
                          for r in records], np.float32)
        scores = np.array([r["predicted_iou"] for r in records], np.float32)
        keep = nms_xyxy(boxes, scores, gen.box_nms_thresh)
        assert len(keep) == len(records)


def test_generate_rle_mode_matches_binary(predictor):
    rng = np.random.default_rng(3)
    image = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    kw = dict(points_per_side=3, points_per_batch=4,
              pred_iou_thresh=0.0, stability_score_thresh=0.0)
    bin_rec = Sam2AutomaticMaskGenerator(predictor, output_mode="binary_mask", **kw).generate(image)
    rle_rec = Sam2AutomaticMaskGenerator(predictor, output_mode="uncompressed_rle", **kw).generate(image)
    assert len(bin_rec) == len(rle_rec)
    for b, r in zip(bin_rec, rle_rec):
        np.testing.assert_array_equal(b["segmentation"], decode_rle(r["segmentation"]))
        assert b["area"] == rle_area(r["segmentation"])


def test_generate_with_crop_layers(predictor):
    """crop_n_layers=1 runs 5 crops; results stay on the full canvas and
    crop_boxes record which crop each mask came from."""
    rng = np.random.default_rng(4)
    image = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    gen = Sam2AutomaticMaskGenerator(
        predictor, points_per_side=3, points_per_batch=4,
        pred_iou_thresh=0.0, stability_score_thresh=0.0, crop_n_layers=1,
    )
    records = gen.generate(image)
    assert len(records) > 0
    _check_records(records, (40, 56))
    crop_boxes = {tuple(r["crop_box"]) for r in records}
    assert len(crop_boxes) >= 1  # at least one crop contributed


def test_generate_m2m(predictor):
    rng = np.random.default_rng(5)
    image = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    gen = Sam2AutomaticMaskGenerator(
        predictor, points_per_side=3, points_per_batch=4,
        pred_iou_thresh=0.0, stability_score_thresh=0.0, use_m2m=True,
    )
    records = gen.generate(image)
    assert len(records) > 0
    _check_records(records, (48, 48))


def test_filters_reduce_candidates(predictor):
    rng = np.random.default_rng(6)
    image = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    kw = dict(points_per_side=4, points_per_batch=8)
    lax = Sam2AutomaticMaskGenerator(
        predictor, pred_iou_thresh=0.0, stability_score_thresh=0.0, **kw
    ).generate(image)
    strict = Sam2AutomaticMaskGenerator(
        predictor, pred_iou_thresh=0.99, stability_score_thresh=0.99, **kw
    ).generate(image)
    assert len(strict) <= len(lax)
    for r in strict:
        assert r["predicted_iou"] > 0.99 and r["stability_score"] >= 0.99


def test_min_mask_region_area(predictor):
    rng = np.random.default_rng(7)
    image = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    gen = Sam2AutomaticMaskGenerator(
        predictor, points_per_side=3, points_per_batch=4,
        pred_iou_thresh=0.0, stability_score_thresh=0.0, min_mask_region_area=16,
    )
    records = gen.generate(image)
    _check_records(records, (48, 48))
    # no foreground island or background hole smaller than the threshold
    from freepose_tpu.ops.connected_components import remove_small_components

    for r in records:
        seg = r["segmentation"]
        cleaned = np.asarray(remove_small_components(jnp.asarray(seg), 16))
        np.testing.assert_array_equal(cleaned, seg)
