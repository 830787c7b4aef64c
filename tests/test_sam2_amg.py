"""AMG utilities vs torch oracles coded against reference amg.py:158-340."""
import numpy as np
import jax.numpy as jnp

from freepose_tpu.models.sam2.amg import (
    batched_mask_to_box,
    build_all_layer_point_grids,
    build_point_grid,
    calculate_stability_score,
    generate_crop_boxes,
    uncrop_boxes_xyxy,
)


def test_point_grids():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    np.testing.assert_allclose(g[0], [1 / 8, 1 / 8])
    np.testing.assert_allclose(g[-1], [7 / 8, 7 / 8])
    layers = build_all_layer_point_grids(32, 2, 2)
    assert [len(g) for g in layers] == [32 * 32, 16 * 16, 8 * 8]


def test_crop_boxes():
    boxes, idxs = generate_crop_boxes((480, 640), n_layers=1, overlap_ratio=512 / 1500)
    assert boxes[0] == [0, 0, 640, 480] and idxs[0] == 0
    assert len(boxes) == 1 + 4 and idxs[1:] == [1] * 4
    for x0, y0, x1, y1 in boxes:
        assert 0 <= x0 < x1 <= 640 and 0 <= y0 < y1 <= 480
    # Layer-1 crops tile the image with overlap.
    import numpy as np

    cover = np.zeros((480, 640), int)
    for x0, y0, x1, y1 in boxes[1:]:
        cover[y0:y1, x0:x1] += 1
    assert (cover >= 1).all() and cover.max() >= 2  # overlapping

    off = uncrop_boxes_xyxy(jnp.asarray([[1.0, 2, 3, 4]]), boxes[2])
    np.testing.assert_allclose(np.asarray(off[0])[:2], [1 + boxes[2][0], 2 + boxes[2][1]])


def test_stability_score():
    logits = np.full((5, 5), -10.0)
    logits[1:4, 1:4] = 5.0  # stable blob: same at +-1 thresholds
    s = float(calculate_stability_score(jnp.asarray(logits), 0.0, 1.0))
    assert s == 1.0
    logits[0, 0] = 0.5  # in the low-threshold set only
    s2 = float(calculate_stability_score(jnp.asarray(logits), 0.0, 1.0))
    assert abs(s2 - 9 / 10) < 1e-6


def test_batched_mask_to_box():
    masks = np.zeros((2, 3, 16, 20), bool)
    masks[0, 0, 2:5, 3:9] = True
    masks[1, 2, 0:1, 19:20] = True
    boxes = np.asarray(batched_mask_to_box(jnp.asarray(masks)))
    assert boxes.shape == (2, 3, 4)
    np.testing.assert_array_equal(boxes[0, 0], [3, 2, 8, 4])  # inclusive edges
    np.testing.assert_array_equal(boxes[1, 2], [19, 0, 19, 0])
    np.testing.assert_array_equal(boxes[0, 1], [0, 0, 0, 0])  # empty
