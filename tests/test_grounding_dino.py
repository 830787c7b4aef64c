"""GroundingDINO structure tests + sub-component parity vs HF."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models.grounding_dino import (
    GDINO_TEST,
    GroundingDino,
    GroundingDinoDetector,
    grid_sample_zeros,
    sine_pos_1d,
    sine_pos_2d,
    text_token_masks,
)


def test_text_token_masks_matches_hf():
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        generate_masks_with_special_tokens_and_transfer_map,
    )

    ids = np.array([[101, 5, 6, 1012, 7, 8, 1012, 102]])
    ours_mask, ours_pos = text_token_masks(ids)
    ref_mask, ref_pos = generate_masks_with_special_tokens_and_transfer_map(torch.tensor(ids))
    np.testing.assert_array_equal(ours_mask, ref_mask.numpy())
    np.testing.assert_array_equal(ours_pos, ref_pos.numpy())


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    value = rng.random((2, 5, 7, 3)).astype(np.float32)
    locs = (rng.random((2, 11, 2)).astype(np.float32) * 2.4 - 1.2)  # incl. out of range
    ours = np.asarray(grid_sample_zeros(jnp.asarray(value), jnp.asarray(locs)))
    ref = torch.nn.functional.grid_sample(
        torch.tensor(value).permute(0, 3, 1, 2),
        torch.tensor(locs)[:, None],
        mode="bilinear", padding_mode="zeros", align_corners=False,
    )[:, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_quad_matches_torch():
    """The single-gather quad formulation == torch grid_sample, including
    far-out-of-range and exactly-on-border samples."""
    from freepose_tpu.models.grounding_dino import grid_sample_zeros_quad

    rng = np.random.default_rng(1)
    value = rng.random((2, 5, 7, 3)).astype(np.float32)
    locs = (rng.random((2, 64, 2)).astype(np.float32) * 3.0 - 1.5)
    locs[0, :8] = [[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [1.0, -1.0],
                   [0.0, 0.0], [-0.999, 0.5], [2.9, 0.0], [0.0, -2.9]]
    ours = np.asarray(grid_sample_zeros_quad(jnp.asarray(value), jnp.asarray(locs)))
    ref = torch.nn.functional.grid_sample(
        torch.tensor(value).permute(0, 3, 1, 2),
        torch.tensor(locs)[:, None],
        mode="bilinear", padding_mode="zeros", align_corners=False,
    )[:, :, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    legacy = np.asarray(grid_sample_zeros(jnp.asarray(value), jnp.asarray(locs)))
    np.testing.assert_allclose(ours, legacy, atol=1e-6)


def test_sine_pos_2d_matches_hf():
    from transformers import GroundingDinoConfig as HFCfg
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        GroundingDinoSinePositionEmbedding,
    )

    cfg = HFCfg(d_model=32)
    pe = GroundingDinoSinePositionEmbedding(cfg)
    mask = torch.ones(1, 6, 9, dtype=torch.long)
    ref = pe(torch.zeros(1, 32, 6, 9), mask).numpy()[0]  # [C, H, W]
    ours = np.asarray(sine_pos_2d(6, 9, 32, cfg.positional_embedding_temperature))
    np.testing.assert_allclose(ours.transpose(2, 0, 1), ref, atol=1e-5)


def test_sine_pos_1d_matches_hf():
    from transformers.models.grounding_dino.modeling_grounding_dino import get_sine_pos_embed

    vals = np.array([0.0, 0.3, 2.0, 7.5], np.float32)
    # HF expects [batch, seq, n] and stacks at dim=3.
    ref = get_sine_pos_embed(
        torch.tensor(vals)[None, :, None], num_pos_feats=16, exchange_xy=False
    ).numpy()[0]
    ours = np.asarray(sine_pos_1d(jnp.asarray(vals), 16))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_model():
    model = GroundingDino(GDINO_TEST)
    ids = np.array([[101, 5, 6, 1012, 102, 0]])
    sa, pos = text_token_masks(ids)
    pad = np.array([[False] * 5 + [True]])
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)), jnp.asarray(ids),
        jnp.asarray(sa), jnp.asarray(pos), jnp.asarray(pad),
    )
    return model, variables["params"], (ids, sa, pos, pad)


def test_forward_shapes_and_ranges(tiny_model):
    model, params, (ids, sa, pos, pad) = tiny_model
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    logits, boxes = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(ids), jnp.asarray(sa),
        jnp.asarray(pos), jnp.asarray(pad),
    )
    assert logits.shape == (1, GDINO_TEST.num_queries, GDINO_TEST.max_text_len)
    assert boxes.shape == (1, GDINO_TEST.num_queries, 4)
    b = np.asarray(boxes)
    assert (b >= 0).all() and (b <= 1).all()
    lg = np.asarray(logits)
    # Padding text positions masked to -inf.
    assert np.isneginf(lg[..., 5:]).all()
    assert np.isfinite(lg[..., :5]).any()


def test_detector_api(tiny_model, monkeypatch):
    monkeypatch.setenv("FREEPOSE_TINY_MODELS", "1")
    _, params, _ = tiny_model
    det = GroundingDinoDetector(GDINO_TEST, params, image_size=64)
    rng = np.random.default_rng(2)
    image = (rng.random((48, 80, 3)) * 255).astype(np.uint8)
    boxes, scores = det.detect(image, input_ids=np.array([[101, 5, 6, 1012, 102]]), box_threshold=0.0)
    assert boxes.shape[1] == 4 and len(boxes) == len(scores)
    assert len(boxes) > 0  # threshold 0 keeps everything

    # Batched path: one jit dispatch, results identical to per-image calls.
    image2 = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    ids = np.array([[101, 5, 6, 1012, 102]])
    batched = det.detect_batch([image, image2], input_ids=ids, box_threshold=0.0)
    solo2 = det.detect(image2, input_ids=ids, box_threshold=0.0)
    np.testing.assert_allclose(batched[0][0], boxes, atol=1e-4)
    np.testing.assert_allclose(batched[1][0], solo2[0], atol=1e-4)
    np.testing.assert_allclose(batched[0][1], scores, atol=1e-5)

    # Probe: nothing above an impossible threshold -> empty [0, 4] boxes.
    none_boxes, none_scores = det.detect(image, input_ids=ids, box_threshold=2.0)
    assert none_boxes.shape == (0, 4) and none_scores.shape == (0,)
