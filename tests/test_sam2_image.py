"""End-to-end SAM2 image-model parity vs HF Sam2Model (random-init, tiny)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models.sam2.convert import sam2_image_model_from_hf
from freepose_tpu.models.sam2.model import SAM2_TEST, Sam2ImageModel


@pytest.fixture(scope="module")
def hf_sam2():
    from transformers import Sam2Model, Sam2Config
    from transformers.models.sam2.configuration_sam2 import (
        Sam2HieraDetConfig,
        Sam2MaskDecoderConfig,
        Sam2PromptEncoderConfig,
        Sam2VisionConfig,
    )

    torch.manual_seed(0)
    h = SAM2_TEST.hiera
    bb = Sam2HieraDetConfig(
        hidden_size=h.embed_dim, num_attention_heads=1,
        blocks_per_stage=list(h.blocks_per_stage),
        embed_dim_per_stage=list(h.embed_dim_per_stage),
        num_attention_heads_per_stage=list(h.heads_per_stage),
        window_size_per_stage=list(h.window_size_per_stage),
        global_attention_blocks=list(h.global_attention_blocks),
        window_positional_embedding_background_size=list(h.window_pos_bg_size),
        image_size=[64, 64],
    )
    vc = Sam2VisionConfig(
        backbone_config=bb, backbone_channel_list=[64, 32, 16, 8], fpn_hidden_size=16,
        backbone_feature_sizes=[[16, 16], [8, 8], [4, 4]], fpn_top_down_levels=[2, 3],
    )
    pe = Sam2PromptEncoderConfig(hidden_size=16, image_size=64, patch_size=16, mask_input_channels=4)
    md = Sam2MaskDecoderConfig(hidden_size=16, num_attention_heads=2, mlp_dim=32, iou_head_hidden_dim=16)
    cfg = Sam2Config(vision_config=vc, prompt_encoder_config=pe, mask_decoder_config=md)
    model = Sam2Model(cfg).eval()
    with torch.no_grad():
        model.vision_encoder.backbone.pos_embed.normal_(0, 0.02)
        model.vision_encoder.backbone.pos_embed_window.normal_(0, 0.02)
        model.no_memory_embedding.normal_(0, 0.02)
    params = sam2_image_model_from_hf(model.state_dict(), total_blocks=4)
    return model, params


def _run_ours(params, img, **kw):
    model = Sam2ImageModel(SAM2_TEST)
    return model.apply({"params": params}, jnp.asarray(img), **kw)


def test_box_prompt_parity(hf_sam2):
    model, params = hf_sam2
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    boxes = np.array([[[8.0, 8.0, 40.0, 48.0]]], np.float32)  # [B, P, 4]
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(img), input_boxes=torch.tensor(boxes), multimask_output=True)
    masks, iou, sam_tokens, obj = _run_ours(params, img, boxes=jnp.asarray(boxes), multimask_output=True)
    np.testing.assert_allclose(np.asarray(masks), ref.pred_masks.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(iou), ref.iou_scores.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(obj), ref.object_score_logits.numpy(), atol=1e-4)


def test_point_prompt_parity(hf_sam2):
    model, params = hf_sam2
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    pts = np.array([[[[20.0, 30.0], [40.0, 10.0]]]], np.float32)  # [B, P, N, 2]
    labels = np.array([[[1, 0]]], np.int64)
    with torch.no_grad():
        ref = model(
            pixel_values=torch.tensor(img),
            input_points=torch.tensor(pts),
            input_labels=torch.tensor(labels),
            multimask_output=False,
        )
    masks, iou, _, obj = _run_ours(
        params, img, points=jnp.asarray(pts), labels=jnp.asarray(labels, jnp.int32),
        multimask_output=False,
    )
    np.testing.assert_allclose(np.asarray(masks), ref.pred_masks.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(iou), ref.iou_scores.numpy(), atol=1e-4)


def test_no_prompt_parity(hf_sam2):
    model, params = hf_sam2
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(img), multimask_output=True)
    masks, iou, _, obj = _run_ours(params, img, multimask_output=True)
    np.testing.assert_allclose(np.asarray(masks), ref.pred_masks.numpy(), atol=2e-3)


def test_mask_prompt_parity(hf_sam2):
    model, params = hf_sam2
    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    pts = np.array([[[[20.0, 30.0]]]], np.float32)
    labels = np.array([[[1]]], np.int64)
    mask_in = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)  # 4G=16
    with torch.no_grad():
        ref = model(
            pixel_values=torch.tensor(img), input_points=torch.tensor(pts),
            input_labels=torch.tensor(labels), input_masks=torch.tensor(mask_in),
            multimask_output=True,
        )
    masks, iou, _, _ = _run_ours(
        params, img, points=jnp.asarray(pts), labels=jnp.asarray(labels, jnp.int32),
        mask_inputs=jnp.asarray(mask_in), multimask_output=True,
    )
    np.testing.assert_allclose(np.asarray(masks), ref.pred_masks.numpy(), atol=2e-3)
