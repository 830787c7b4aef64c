import json

import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.models.clip import ClipConfig, ClipFeatureExtractor
from freepose_tpu.pipeline.proposals import Proposals
from freepose_tpu.pipeline.scale_estimator import (
    ClipPriorScaleEstimator,
    ConstantScaleEstimator,
    MeanScaleEstimator,
    depth_scales,
)

CFG = ClipConfig(
    image_size=28, patch_size=14, vision_width=32, vision_layers=2, vision_heads=2,
    vocab_size=64, context_length=12, text_width=24, text_layers=2, text_heads=2,
    embed_dim=16,
)


def _hash_tokenize(names, length=12, vocab=64):
    """Deterministic stand-in tokenizer for tests."""
    out = np.zeros((len(names), length), np.int32)
    for i, n in enumerate(names):
        h = abs(hash(n))
        for j in range(length - 1):
            out[i, j] = 1 + (h >> (j * 3)) % (vocab - 2)
        out[i, length - 1] = vocab - 1  # EOT
    return out


def _fake_scene(n_objects=3):
    """Depth image with flat square objects of known metric size."""
    k = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]], np.float32)
    depth = np.zeros((128, 128), np.float32)
    masks = np.zeros((n_objects, 128, 128), bool)
    true_half = []
    for i in range(n_objects):
        size = 24 + 8 * i  # px
        z = 2.0
        y0, x0 = 6 + i * 40, 6 + i * 40
        depth[y0 : y0 + size, x0 : x0 + size] = z
        masks[i, y0 : y0 + size, x0 : x0 + size] = True
        true_half.append(size * z / 100.0 / 2.0)  # metric half extent
    return depth, masks, k, np.asarray(true_half)


def test_depth_scales_recovers_metric_size():
    depth, masks, k, true_half = _fake_scene()
    got = np.asarray(depth_scales(jnp.asarray(depth), jnp.asarray(k), jnp.asarray(masks), svd=False, erosion_radius=2))
    # Radius-2 erosion removes 2 px per side; extents use pixel centres, so a
    # `size`-px square measures (size - 4 - 1) px across.
    sizes = np.array([24, 32, 40])
    expected = (sizes - 5) * 2.0 / 100.0 / 2.0
    np.testing.assert_allclose(got, expected, rtol=0.02)
    # Sanity: within ~25% of the true metric half extents.
    np.testing.assert_allclose(got, true_half, rtol=0.25)


def test_constant_estimator():
    est = ConstantScaleEstimator(0.1)
    np.testing.assert_allclose(est.estimate([1, 2, 3]), [0.1, 0.1, 0.1], atol=1e-7)


def _proposals(depth, masks):
    boxes = []
    for m in masks:
        ys, xs = np.nonzero(m)
        boxes.append([xs.min(), ys.min(), xs.max(), ys.max()])
    img = jnp.zeros((masks.shape[0], 3, 28, 28))
    return Proposals(
        proposals=img,
        masks=jnp.asarray(masks[:, :28, :28]),
        boxes=jnp.asarray(np.asarray(boxes, np.int32)),
        full_masks=jnp.asarray(masks),
    )


def test_mean_estimator_correction():
    depth, masks, k, true_half = _fake_scene()
    props = _proposals(depth, masks)
    est = MeanScaleEstimator(mean_scale=2 * true_half.mean(), svd=False)
    got = est.estimate(props, depth, k)
    # Mean of returned scales equals the target mean (by construction).
    np.testing.assert_allclose(np.mean(got), true_half.mean(), rtol=1e-5)


@pytest.fixture(scope="module")
def clip_fe():
    return ClipFeatureExtractor(CFG)


def test_clip_prior_estimator(tmp_path_factory, clip_fe):
    tmp = tmp_path_factory.mktemp("scales")
    prior = {f"object {i}": 0.1 + 0.05 * i for i in range(20)}
    scale_file = tmp / "gpt4_scales.json"
    scale_file.write_text(json.dumps(prior))

    est = ClipPriorScaleEstimator(
        clip_fe, _hash_tokenize, scale_file=scale_file,
        feats_path=tmp / "scale_feats.npz", query_k=5,
    )
    assert est.text_features.shape == (20, 16)
    depth, masks, k, _ = _fake_scene()
    props = _proposals(depth, masks)
    scales = est.estimate(props)  # no depth: raw prior kNN / 2
    assert scales.shape == (3,)
    assert (scales > 0).all() and (scales < 1).all()

    # With depth: correction ties scales to depth observations.
    scales_d = est.estimate(props, depth, k)
    assert scales_d.shape == (3,)
    assert np.isfinite(scales_d).all()
    # Depth-corrected scales preserve the ratio structure of depth scales.
    r = scales_d / scales_d[0]
    assert r[1] > 1.0 and r[2] > r[1]

    # Cached text features reload without the scale file.
    est2 = ClipPriorScaleEstimator(clip_fe, _hash_tokenize, feats_path=tmp / "scale_feats.npz")
    np.testing.assert_allclose(np.asarray(est2.text_features), np.asarray(est.text_features))
