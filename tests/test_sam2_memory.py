"""Parity of the SAM2 memory attention + memory encoder vs HF Sam2Video."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models.sam2.convert import memory_attention_from_hf, memory_encoder_from_hf
from freepose_tpu.models.sam2.memory import (
    MemoryAttention,
    MemoryConfig,
    MemoryEncoder,
    sine_1d_pe,
)

GRID = 4  # current feature grid (stride-16 of a 64px image)
CFG = MemoryConfig(
    hidden_size=16, num_layers=2, num_heads=1, downsample_rate=1, ff_hidden=32,
    rope_feat_size=GRID, mem_dim=64, enc_hidden=16, fuser_intermediate=32,
)


@pytest.fixture(scope="module")
def hf_video():
    from transformers import Sam2VideoConfig, Sam2VideoModel
    from transformers.models.sam2.configuration_sam2 import (
        Sam2HieraDetConfig,
        Sam2VisionConfig as Sam2VideoVisionConfig,
    )
    from transformers.models.sam2_video.configuration_sam2_video import (
        Sam2VideoMaskDecoderConfig,
        Sam2VideoPromptEncoderConfig,
    )

    torch.manual_seed(0)
    bb = Sam2HieraDetConfig(
        hidden_size=8, num_attention_heads=1, blocks_per_stage=[1, 1, 1, 1],
        embed_dim_per_stage=[8, 16, 32, 64], num_attention_heads_per_stage=[1, 2, 4, 8],
        window_size_per_stage=[4, 4, 4, 4], global_attention_blocks=[9],
        window_positional_embedding_background_size=[2, 2], image_size=[64, 64],
    )
    vc = Sam2VideoVisionConfig(
        backbone_config=bb, backbone_channel_list=[64, 32, 16, 8], fpn_hidden_size=16,
        backbone_feature_sizes=[[16, 16], [8, 8], [4, 4]], fpn_top_down_levels=[2, 3],
    )
    pe = Sam2VideoPromptEncoderConfig(hidden_size=16, image_size=64, patch_size=16, mask_input_channels=4)
    md = Sam2VideoMaskDecoderConfig(hidden_size=16, num_attention_heads=2, mlp_dim=32, iou_head_hidden_dim=16)
    cfg = Sam2VideoConfig(
        vision_config=vc, prompt_encoder_config=pe, mask_decoder_config=md,
        memory_attention_hidden_size=16, memory_attention_num_layers=2,
        memory_attention_num_attention_heads=1, memory_attention_downsample_rate=1,
        memory_attention_feed_forward_hidden_size=32,
        memory_attention_rope_feat_sizes=[GRID, GRID],
        memory_encoder_hidden_size=16, memory_encoder_output_channels=64,
        mask_downsampler_embed_dim=16, memory_fuser_embed_dim=16,
        memory_fuser_intermediate_dim=32, image_size=64,
    )
    model = Sam2VideoModel(cfg).eval()
    return model


def test_memory_attention_parity(hf_video):
    model = hf_video
    sd = model.state_dict()
    params = memory_attention_from_hf(sd, num_layers=2)
    rng = np.random.default_rng(0)
    hw = GRID * GRID
    n_mem = 2 * hw  # two spatial memory frames
    n_ptr = 4  # 4 pointer tokens (after splitting)
    curr = rng.normal(size=(hw, 1, 16)).astype(np.float32)  # (seq, batch, C)
    curr_pos = rng.normal(size=(hw, 1, 16)).astype(np.float32)
    memory = rng.normal(size=(n_mem + n_ptr, 1, 64)).astype(np.float32)
    memory_pos = rng.normal(size=(n_mem + n_ptr, 1, 64)).astype(np.float32)

    with torch.no_grad():
        ref = model.memory_attention(
            current_vision_features=torch.tensor(curr),
            memory=torch.tensor(memory),
            current_vision_position_embeddings=torch.tensor(curr_pos),
            memory_posision_embeddings=torch.tensor(memory_pos),
            num_object_pointer_tokens=n_ptr,
        )
    ref = ref.squeeze(2).numpy() if ref.ndim == 4 else ref.numpy()

    ours = MemoryAttention(CFG).apply(
        {"params": params},
        jnp.asarray(curr.transpose(1, 0, 2)),
        jnp.asarray(curr_pos.transpose(1, 0, 2)),
        jnp.asarray(memory.transpose(1, 0, 2)),
        jnp.asarray(memory_pos.transpose(1, 0, 2)),
        n_ptr,
        jnp.ones((1, n_mem + n_ptr), bool),
    )
    np.testing.assert_allclose(np.asarray(ours)[0], ref[:, 0].reshape(hw, 16), atol=3e-4)


def test_memory_attention_padding_equivalence(hf_video):
    """Padding the memory with masked slots must not change the output."""
    model = hf_video
    params = memory_attention_from_hf(model.state_dict(), num_layers=2)
    rng = np.random.default_rng(1)
    hw = GRID * GRID
    curr = rng.normal(size=(1, hw, 16)).astype(np.float32)
    curr_pos = rng.normal(size=(1, hw, 16)).astype(np.float32)
    mem = rng.normal(size=(1, hw + 2, 64)).astype(np.float32)  # 1 frame + 2 ptrs
    mem_pos = rng.normal(size=(1, hw + 2, 64)).astype(np.float32)

    out_ref = MemoryAttention(CFG).apply(
        {"params": params}, jnp.asarray(curr), jnp.asarray(curr_pos),
        jnp.asarray(mem), jnp.asarray(mem_pos), 2, jnp.ones((1, hw + 2), bool),
    )
    # Pad one full junk spatial frame (masked) between real memory and ptrs.
    junk = rng.normal(size=(1, hw, 64)).astype(np.float32)
    mem_pad = np.concatenate([mem[:, :hw], junk, mem[:, hw:]], axis=1)
    mem_pos_pad = np.concatenate([mem_pos[:, :hw], junk, mem_pos[:, hw:]], axis=1)
    mask = np.ones((1, 2 * hw + 2), bool)
    mask[:, hw : 2 * hw] = False
    out_pad = MemoryAttention(CFG).apply(
        {"params": params}, jnp.asarray(curr), jnp.asarray(curr_pos),
        jnp.asarray(mem_pad), jnp.asarray(mem_pos_pad), 2, jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_ref), atol=2e-5)


def test_memory_encoder_parity(hf_video):
    model = hf_video
    params = memory_encoder_from_hf(model.state_dict())
    rng = np.random.default_rng(2)
    pix = rng.normal(size=(1, 16, GRID, GRID)).astype(np.float32)  # NCHW
    masks = rng.normal(size=(1, 1, GRID * 16, GRID * 16)).astype(np.float32)
    with torch.no_grad():
        ref_feat, ref_pos = model.memory_encoder(torch.tensor(pix), torch.tensor(masks))
    ours_feat, ours_pos = MemoryEncoder(CFG).apply(
        {"params": params},
        jnp.asarray(pix.transpose(0, 2, 3, 1)),
        jnp.asarray(masks.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(ours_feat).transpose(0, 3, 1, 2), ref_feat.numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours_pos).transpose(2, 0, 1), ref_pos[0].numpy(), atol=1e-4
    )


def test_sine_1d_pe_matches_hf():
    from transformers.models.sam2_video.modeling_sam2_video import get_1d_sine_pe

    pos = np.array([0.0, 0.25, 0.5, 1.0], np.float32)
    ref = get_1d_sine_pe(torch.tensor(pos), dim=16).numpy()
    ours = np.asarray(sine_1d_pe(jnp.asarray(pos), 16))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
