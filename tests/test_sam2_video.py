"""End-to-end SAM2 VIDEO tracking parity: our fixed-capacity functional state
vs HF Sam2VideoModel's dict-based inference session, over a short random
video with a point prompt on frame 0."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models.sam2.convert import sam2_video_model_from_hf
from freepose_tpu.models.sam2.hiera import HieraConfig
from freepose_tpu.models.sam2.mask_decoder import MaskDecoderConfig
from freepose_tpu.models.sam2.memory import MemoryConfig
from freepose_tpu.models.sam2.model import Sam2Config
from freepose_tpu.models.sam2.prompt import PromptConfig
from freepose_tpu.models.sam2.video import (
    Sam2VideoConfig,
    Sam2VideoModel,
    init_object_state,
)

D = 128  # fpn / decoder / prompt / memory hidden; mem_dim is 64 (2 splits)
GRID = 4
IMG = 64
N_FRAMES = 5

OUR_CFG = Sam2VideoConfig(
    sam=Sam2Config(
        hiera=HieraConfig(
            embed_dim=8, blocks_per_stage=(1, 1, 1, 1), embed_dim_per_stage=(8, 16, 32, 64),
            heads_per_stage=(1, 2, 4, 8), window_size_per_stage=(4, 4, 4, 4),
            global_attention_blocks=(9,), window_pos_bg_size=(2, 2),
        ),
        prompt=PromptConfig(hidden_size=D, image_size=IMG, patch_size=16, mask_input_channels=16),
        decoder=MaskDecoderConfig(hidden_size=D, num_heads=2, mlp_dim=32, iou_head_hidden=D),
        fpn_dim=D,
    ),
    mem=MemoryConfig(
        hidden_size=D, num_layers=2, num_heads=1, downsample_rate=1, ff_hidden=32,
        rope_feat_size=GRID, mem_dim=64, enc_hidden=D, fuser_intermediate=32,
    ),
    image_size=IMG,
    mem_grid=GRID,
)


@pytest.fixture(scope="module")
def hf_and_params():
    from transformers import Sam2VideoConfig as HFVideoConfig, Sam2VideoModel as HFVideoModel
    from transformers.models.sam2.configuration_sam2 import Sam2HieraDetConfig, Sam2VisionConfig
    from transformers.models.sam2_video.configuration_sam2_video import (
        Sam2VideoMaskDecoderConfig,
        Sam2VideoPromptEncoderConfig,
    )

    torch.manual_seed(0)
    bb = Sam2HieraDetConfig(
        hidden_size=8, num_attention_heads=1, blocks_per_stage=[1, 1, 1, 1],
        embed_dim_per_stage=[8, 16, 32, 64], num_attention_heads_per_stage=[1, 2, 4, 8],
        window_size_per_stage=[4, 4, 4, 4], global_attention_blocks=[9],
        window_positional_embedding_background_size=[2, 2], image_size=[IMG, IMG],
    )
    vc = Sam2VisionConfig(
        backbone_config=bb, backbone_channel_list=[64, 32, 16, 8], fpn_hidden_size=D,
        backbone_feature_sizes=[[16, 16], [8, 8], [GRID, GRID]], fpn_top_down_levels=[2, 3],
    )
    pe = Sam2VideoPromptEncoderConfig(hidden_size=D, image_size=IMG, patch_size=16, mask_input_channels=16)
    md = Sam2VideoMaskDecoderConfig(hidden_size=D, num_attention_heads=2, mlp_dim=32, iou_head_hidden_dim=D)
    cfg = HFVideoConfig(
        vision_config=vc, prompt_encoder_config=pe, mask_decoder_config=md,
        memory_attention_hidden_size=D, memory_attention_num_layers=2,
        memory_attention_num_attention_heads=1, memory_attention_downsample_rate=1,
        memory_attention_feed_forward_hidden_size=32,
        memory_attention_rope_feat_sizes=[GRID, GRID],
        memory_encoder_hidden_size=D, memory_encoder_output_channels=64,
        mask_downsampler_embed_dim=D, memory_fuser_embed_dim=D,
        memory_fuser_intermediate_dim=32, image_size=IMG,
    )
    model = HFVideoModel(cfg).eval()
    with torch.no_grad():
        model.vision_encoder.backbone.pos_embed.normal_(0, 0.02)
        model.vision_encoder.backbone.pos_embed_window.normal_(0, 0.02)
        model.no_memory_embedding.normal_(0, 0.02)
        model.memory_temporal_positional_encoding.normal_(0, 0.02)
        model.no_object_pointer.normal_(0, 0.02)
        model.occlusion_spatial_embedding_parameter.normal_(0, 0.02)
    params = sam2_video_model_from_hf(model.state_dict(), total_blocks=4, mem_layers=2)
    return model, params


def test_video_propagation_parity(hf_and_params):
    from transformers import Sam2VideoInferenceSession

    hf_model, params = hf_and_params
    rng = np.random.default_rng(0)
    video = rng.normal(size=(N_FRAMES, 3, IMG, IMG)).astype(np.float32) * 0.2

    # ---- HF side ------------------------------------------------------ #
    session = Sam2VideoInferenceSession(
        video=torch.tensor(video), video_height=IMG, video_width=IMG, dtype=torch.float32,
    )
    session.obj_id_to_idx(1)
    pts = torch.tensor([[[[20.0, 30.0]]]])
    labels = torch.tensor([[[1]]])
    session.add_point_inputs(0, 0, {"point_coords": pts, "point_labels": labels})
    session.obj_with_new_inputs = [1]
    with torch.no_grad():
        hf_model(inference_session=session, frame_idx=0)
        hf_masks = []
        for out in hf_model.propagate_in_video_iterator(session, start_frame_idx=0):
            hf_masks.append(out.pred_masks.squeeze().numpy())

    # ---- Our side ------------------------------------------------------ #
    model = Sam2VideoModel(OUR_CFG)
    state = init_object_state(OUR_CFG)

    def embed(frame):
        return model.apply({"params": params}, jnp.asarray(frame)[None], method=Sam2VideoModel.embed_frame)

    our_masks = []
    for t in range(N_FRAMES):
        pyramid, pos = embed(video[t])
        raw_s2 = pyramid[2]
        pos_s2 = pos[2]
        kwargs = dict(
            state=state, pyramid=pyramid, raw_s2=raw_s2, pos_s2=pos_s2,
            frame_idx=jnp.int32(t), num_frames=jnp.int32(N_FRAMES),
        )
        if t == 0:
            kwargs.update(points=jnp.asarray(pts.numpy()), labels=jnp.asarray(labels.numpy(), jnp.int32), is_init=True)
        state, out = model.apply({"params": params}, method=Sam2VideoModel.track_step, **kwargs)
        our_masks.append(np.asarray(out["pred_masks"])[0])

    assert len(hf_masks) == N_FRAMES
    for t in range(N_FRAMES):
        np.testing.assert_allclose(
            our_masks[t], hf_masks[t], atol=5e-2, err_msg=f"frame {t}",
        )
        # Agreement on the binarized mask must be near-perfect.
        agree = np.mean((our_masks[t] > 0) == (hf_masks[t] > 0))
        assert agree > 0.995, f"frame {t}: binary agreement {agree}"


def test_state_is_fixed_capacity(hf_and_params):
    _, params = hf_and_params
    model = Sam2VideoModel(OUR_CFG)
    state = init_object_state(OUR_CFG)
    rng = np.random.default_rng(1)
    video = rng.normal(size=(12, 3, IMG, IMG)).astype(np.float32) * 0.2
    shapes0 = jax.tree.map(lambda x: x.shape, state)
    pts = jnp.asarray([[[[20.0, 30.0]]]])
    labels = jnp.asarray([[[1]]], jnp.int32)
    for t in range(12):
        pyramid, pos = model.apply(
            {"params": params}, jnp.asarray(video[t])[None], method=Sam2VideoModel.embed_frame
        )
        kwargs = dict(
            state=state, pyramid=pyramid, raw_s2=pyramid[2], pos_s2=pos[2],
            frame_idx=jnp.int32(t), num_frames=jnp.int32(12),
        )
        if t == 0:
            kwargs.update(points=pts, labels=labels, is_init=True)
        state, out = model.apply({"params": params}, method=Sam2VideoModel.track_step, **kwargs)
        assert jax.tree.map(lambda x: x.shape, state) == shapes0  # static capacity
    # Ring occupancy: all non-cond maskmem slots in use after >6 frames.
    assert bool(state.maskmem_valid.all())
    assert int(state.maskmem_frame[0]) == 0
