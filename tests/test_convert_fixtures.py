"""Released-checkpoint layout fixtures for every converter family.

The per-family parity tests (test_dinov2.py, test_clip.py, ...) verify
numerics on tiny twins; these fixtures verify the KEY/SHAPE MAPS at the
released checkpoints' real topology (full depth, real stage layouts,
registers, relative-position tables), so a weights-available environment is
turnkey. No downloads: HF state dicts are synthesized by instantiating the
transformers model class with the released architecture config (exact key
set by construction) at shrunk widths; torch.hub layouts (dinov2, open_clip)
are synthesized from their published module naming.

Each fixture asserts BOTH directions of the map:
  1. the converted pytree matches our model's init pytree exactly
     (same paths, same shapes — via jax.eval_shape, no FLOPs), and
  2. every source key was consumed by the converter, up to an explicit
     allowlist of buffers/heads we intentionally drop (catches silently
     ignored weights, the classic converter failure).
Reference load sites: src/pipeline/retrieval/dino.py:10,
sam2/build_sam.py:117-127, scripts/compute_scale_video.py:40,
src/pipeline/tracking/tracking_refiner.py:23-24.
"""
from __future__ import annotations

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models import convert as C


class RecordingSD(dict):
    """State-dict wrapper recording which keys the converter read."""

    def __init__(self, sd):
        super().__init__(sd)
        self.consumed: set[str] = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


def _shapes(tree) -> dict[str, tuple]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in flat}


def _assert_structure(converted, init_params) -> None:
    got, want = _shapes(converted), _shapes(init_params)
    assert got == want, (
        f"missing={sorted(set(want) - set(got))[:8]} "
        f"extra={sorted(set(got) - set(want))[:8]} "
        f"mismatch={[(k, got[k], want[k]) for k in got if k in want and got[k] != want[k]][:8]}"
    )


def _assert_consumed(sd: RecordingSD, allowed_unused: list[str]) -> None:
    left = [
        k for k in sd
        if k not in sd.consumed and not any(re.search(a, k) for a in allowed_unused)
    ]
    assert not left, f"converter silently ignored: {left[:12]}"


# --------------------------------------------------------------------- #
# DINOv2 ViT-L/14-reg + ViT-B/14-reg (HF + hub layouts).


@pytest.mark.parametrize("layers,heads", [(24, 16), (12, 12)], ids=["vit-l", "vit-b"])
def test_dinov2_hf_released_topology(layers, heads):
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    from freepose_tpu.models.dinov2 import DinoV2, DinoV2Config

    width = 4 * heads  # head_dim 4; real depth + register count
    cfg = DinoV2Config(hidden_size=width, num_layers=layers, num_heads=heads,
                       patch_size=14, image_size=56, num_registers=4)
    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=width, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=width * 4, patch_size=14, image_size=56,
        num_register_tokens=4,
    )
    torch.manual_seed(0)
    sd = RecordingSD(Dinov2WithRegistersModel(hf_cfg).state_dict())
    params = C.dinov2_from_hf(sd, layers)
    init = jax.eval_shape(
        DinoV2(cfg).init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 3, 56, 56), jnp.float32),
    )["params"]
    _assert_structure(params, init)
    _assert_consumed(sd, [r"\.mask_token$"])


def test_dinov2_hub_released_topology():
    """torch.hub facebookresearch/dinov2 `dinov2_vitl14_reg` naming."""
    from freepose_tpu.models.dinov2 import DinoV2, DinoV2Config

    layers, heads, width, mlp = 24, 16, 64, 256
    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    sd = {
        "cls_token": t(1, 1, width), "register_tokens": t(1, 4, width),
        "pos_embed": t(1, 1 + 16, width), "mask_token": t(1, width),
        "patch_embed.proj.weight": t(width, 3, 14, 14),
        "patch_embed.proj.bias": t(width),
        "norm.weight": t(width), "norm.bias": t(width),
    }
    for i in range(layers):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": t(width), f"{p}.norm1.bias": t(width),
            f"{p}.attn.qkv.weight": t(3 * width, width), f"{p}.attn.qkv.bias": t(3 * width),
            f"{p}.attn.proj.weight": t(width, width), f"{p}.attn.proj.bias": t(width),
            f"{p}.ls1.gamma": t(width),
            f"{p}.norm2.weight": t(width), f"{p}.norm2.bias": t(width),
            f"{p}.mlp.fc1.weight": t(mlp, width), f"{p}.mlp.fc1.bias": t(mlp),
            f"{p}.mlp.fc2.weight": t(width, mlp), f"{p}.mlp.fc2.bias": t(width),
            f"{p}.ls2.gamma": t(width),
        })
    sd = RecordingSD(sd)
    params = C.dinov2_from_hub(sd, layers)
    cfg = DinoV2Config(hidden_size=width, num_layers=layers, num_heads=heads,
                       patch_size=14, image_size=56, num_registers=4)
    init = jax.eval_shape(
        DinoV2(cfg).init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 3, 56, 56), jnp.float32),
    )["params"]
    _assert_structure(params, init)
    _assert_consumed(sd, [r"^mask_token$"])


# --------------------------------------------------------------------- #
# CLIP ViT-bigG-14: 48 vision / 32 text layers (HF + open_clip layouts).


def _bigg_cfg(width_scale: int = 1):
    from freepose_tpu.models.clip import ClipConfig

    return ClipConfig(
        image_size=28, patch_size=14,
        vision_width=16 * width_scale, vision_layers=48, vision_heads=2,
        vocab_size=128, context_length=13,
        text_width=8 * width_scale, text_layers=32, text_heads=2,
        embed_dim=8 * width_scale,
    )


def _clip_init_shapes(cfg):
    from freepose_tpu.models.clip import Clip

    model = Clip(cfg)

    def init(key, img, ids):
        vis = model.init(key, img, method=Clip.encode_image)["params"]
        txt = model.init(key, ids, method=Clip.encode_text)["params"]
        return {"params": {**vis, **txt}}

    shapes = jax.eval_shape(
        init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 3, 28, 28), jnp.float32),
        jax.ShapeDtypeStruct((1, cfg.context_length), jnp.int32),
    )
    return shapes["params"]


def test_clip_hf_released_topology():
    from transformers import CLIPConfig, CLIPModel

    cfg = _bigg_cfg()
    hf_cfg = CLIPConfig(
        text_config=dict(
            vocab_size=cfg.vocab_size, hidden_size=cfg.text_width,
            intermediate_size=cfg.text_width * 4, num_hidden_layers=cfg.text_layers,
            num_attention_heads=cfg.text_heads, max_position_embeddings=cfg.context_length,
            projection_dim=cfg.embed_dim,
        ),
        vision_config=dict(
            hidden_size=cfg.vision_width, intermediate_size=cfg.vision_width * 4,
            num_hidden_layers=cfg.vision_layers, num_attention_heads=cfg.vision_heads,
            image_size=cfg.image_size, patch_size=cfg.patch_size,
            projection_dim=cfg.embed_dim,
        ),
        projection_dim=cfg.embed_dim,
    )
    torch.manual_seed(0)
    sd = RecordingSD(CLIPModel(hf_cfg).state_dict())
    params = C.clip_from_hf(sd, cfg.vision_layers, cfg.text_layers)
    _assert_structure(params, _clip_init_shapes(cfg))
    # logit_scale: retrieval is plain cosine scoring (compute_scale.py kNN);
    # position_ids are buffers.
    _assert_consumed(sd, [r"logit_scale", r"position_ids"])


def test_clip_open_clip_released_topology():
    cfg = _bigg_cfg()
    rng = np.random.default_rng(1)

    def t(*shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    def resblocks(prefix, n, w):
        out = {}
        for i in range(n):
            p = f"{prefix}.{i}"
            out.update({
                f"{p}.ln_1.weight": t(w), f"{p}.ln_1.bias": t(w),
                f"{p}.attn.in_proj_weight": t(3 * w, w), f"{p}.attn.in_proj_bias": t(3 * w),
                f"{p}.attn.out_proj.weight": t(w, w), f"{p}.attn.out_proj.bias": t(w),
                f"{p}.ln_2.weight": t(w), f"{p}.ln_2.bias": t(w),
                f"{p}.mlp.c_fc.weight": t(4 * w, w), f"{p}.mlp.c_fc.bias": t(4 * w),
                f"{p}.mlp.c_proj.weight": t(w, 4 * w), f"{p}.mlp.c_proj.bias": t(w),
            })
        return out

    vw, tw = cfg.vision_width, cfg.text_width
    grid = (cfg.image_size // cfg.patch_size) ** 2
    sd = {
        "visual.class_embedding": t(vw),
        "visual.positional_embedding": t(grid + 1, vw),
        "visual.conv1.weight": t(vw, 3, 14, 14),
        "visual.ln_pre.weight": t(vw), "visual.ln_pre.bias": t(vw),
        "visual.ln_post.weight": t(vw), "visual.ln_post.bias": t(vw),
        "visual.proj": t(vw, cfg.embed_dim),
        "token_embedding.weight": t(cfg.vocab_size, tw),
        "positional_embedding": t(cfg.context_length, tw),
        "ln_final.weight": t(tw), "ln_final.bias": t(tw),
        "text_projection": t(tw, cfg.embed_dim),
        "logit_scale": t(),
        "attn_mask": t(cfg.context_length, cfg.context_length),
    }
    sd.update(resblocks("visual.transformer.resblocks", cfg.vision_layers, vw))
    sd.update(resblocks("transformer.resblocks", cfg.text_layers, tw))
    sd = RecordingSD(sd)
    params = C.clip_from_open_clip(sd, cfg.vision_layers, cfg.text_layers)
    _assert_structure(params, _clip_init_shapes(cfg))
    _assert_consumed(sd, [r"logit_scale", r"attn_mask"])


# --------------------------------------------------------------------- #
# GroundingDINO: the reference loads IDEA-Research/grounding-dino-base
# (extract_proposals_ground.py:48) whose backbone is Swin-B — depths
# [2,2,18,2], heads scaling (4,8,16,32), BERT-12 text, 6/6 enc/dec layers.
# The fixture exercises exactly that layout at tiny widths.


def test_grounding_dino_hf_released_topology():
    from transformers import (
        BertConfig as HFBertConfig,
        GroundingDinoConfig as HFGDConfig,
        GroundingDinoForObjectDetection,
        SwinConfig as HFSwinConfig,
    )

    from freepose_tpu.models.grounding_dino import GroundingDino, GroundingDinoConfig
    from freepose_tpu.models.bert import BertConfig
    from freepose_tpu.models.swin import SwinConfig

    depths, heads = [2, 2, 18, 2], [1, 2, 4, 8]
    swin = HFSwinConfig(
        image_size=64, patch_size=4, embed_dim=8, depths=depths, num_heads=heads,
        window_size=4, out_features=["stage2", "stage3", "stage4"], drop_path_rate=0.0,
    )
    text = HFBertConfig(
        vocab_size=2000, hidden_size=24, num_hidden_layers=12, num_attention_heads=2,
        intermediate_size=48, max_position_embeddings=64,
    )
    cfg = HFGDConfig(
        backbone_config=swin, text_config=text, d_model=32, num_feature_levels=4,
        encoder_layers=6, decoder_layers=6, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_queries=12, max_text_len=16, disable_custom_kernels=True,
    )
    torch.manual_seed(0)
    sd = RecordingSD(GroundingDinoForObjectDetection(cfg).state_dict())
    params = C.grounding_dino_from_hf(
        sd, swin_depths=depths, swin_out_stages=[1, 2, 3], text_layers=12,
        encoder_layers=6, decoder_layers=6, num_levels=4,
    )
    our_cfg = GroundingDinoConfig(
        swin=SwinConfig(embed_dim=8, depths=tuple(depths), num_heads=tuple(heads),
                        window_size=4, out_stages=(1, 2, 3)),
        text=BertConfig(vocab_size=2000, hidden_size=24, num_layers=12, num_heads=2,
                        intermediate=48, max_position=64),
        d_model=32, num_feature_levels=4, encoder_layers=6, decoder_layers=6,
        encoder_heads=4, decoder_heads=4, encoder_ffn=64, decoder_ffn=64,
        num_queries=12, max_text_len=16,
    )
    from freepose_tpu.models.grounding_dino import text_token_masks

    ids = np.array([[101, 55, 66, 1012, 102, 0]])
    sa, pos = text_token_masks(ids)
    init = jax.eval_shape(
        GroundingDino(our_cfg).init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 3, 64, 64), jnp.float32),
        jnp.asarray(ids), jnp.asarray(sa), jnp.asarray(pos),
        jnp.asarray(ids == 0),
    )["params"]
    _assert_structure(params, init)
    _assert_consumed(sd, [
        r"position_ids", r"relative_position_index",
        r"text_backbone\.pooler",  # BERT pooler head: detection never runs it
        # decoder_bbox_embed_share=True ties model.decoder.bbox_embed to the
        # top-level bbox_embed the converter reads (verified same tensors).
        r"^model\.decoder\.bbox_embed\.",
    ])


# --------------------------------------------------------------------- #
# ZoeDepth ZoeD_N (BEiT-L 24 layers + DPT neck + metric bins head).


def test_zoedepth_hf_released_topology():
    from transformers import ZoeDepthConfig, ZoeDepthForDepthEstimation

    from freepose_tpu.models.beit import BeitConfig
    from freepose_tpu.models.zoedepth import DEPTH_TEST, ZoeDepthModel

    layers = 24
    bc = dict(
        model_type="beit", hidden_size=32, num_hidden_layers=layers,
        num_attention_heads=4, intermediate_size=64, image_size=64, patch_size=16,
        use_relative_position_bias=True,
        out_features=["stage6", "stage12", "stage18", "stage24"],
        out_indices=[6, 12, 18, 24], reshape_hidden_states=False,
    )
    cfg = ZoeDepthConfig(
        backbone_config=bc, neck_hidden_sizes=[16, 24, 32, 40], fusion_hidden_size=32,
        num_attractors=[16, 8, 4, 1], bin_embedding_dim=8, bottleneck_features=32,
        num_relative_features=8,
    )
    torch.manual_seed(0)
    sd = RecordingSD(ZoeDepthForDepthEstimation(cfg).state_dict())
    params = C.zoedepth_from_hf(sd, num_layers=layers)
    cfg_j = dataclasses.replace(
        DEPTH_TEST,
        beit=BeitConfig(hidden_size=32, num_layers=layers, num_heads=4,
                        intermediate_size=64, patch_size=16, image_size=64,
                        out_indices=(6, 12, 18, 24)),
        neck_hidden_sizes=(16, 24, 32, 40), fusion_hidden_size=32,
        num_attractors=(16, 8, 4, 1), bin_embedding_dim=8,
        bottleneck_features=32, num_relative_features=8,
    )
    init = jax.eval_shape(
        ZoeDepthModel(cfg_j).init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 3, 64, 64), jnp.float32),
    )["params"]
    _assert_structure(params, init)
    # fusion layer 0's residual_layer1 exists in the checkpoint but HF calls
    # it with residual=None — dead weights by construction (convert.py:378).
    _assert_consumed(sd, [
        r"relative_position_index",
        r"fusion_stage\.layers\.0\.residual_layer1\.",
    ])


# --------------------------------------------------------------------- #
# SAM2 hiera-large (blocks (2, 6, 36, 4), released global-attn indices).


def test_sam2_hf_released_topology():
    from transformers import Sam2Config, Sam2Model
    from transformers.models.sam2.configuration_sam2 import (
        Sam2HieraDetConfig,
        Sam2MaskDecoderConfig,
        Sam2PromptEncoderConfig,
        Sam2VisionConfig,
    )

    from freepose_tpu.models.sam2.convert import sam2_image_model_from_hf
    from freepose_tpu.models.sam2.hiera import HIERA_L
    from freepose_tpu.models.sam2.model import SAM2_TEST, Sam2ImageModel

    h = dataclasses.replace(  # real topology (stages, windows, globals), tiny width
        HIERA_L, embed_dim=8, embed_dim_per_stage=(8, 16, 32, 64),
    )
    total = sum(h.blocks_per_stage)
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
        backbone_config=bb,
        backbone_channel_list=[h.embed_dim * 8, h.embed_dim * 4, h.embed_dim * 2, h.embed_dim],
        fpn_hidden_size=16,
        backbone_feature_sizes=[[16, 16], [8, 8], [4, 4]], fpn_top_down_levels=[2, 3],
    )
    pe = Sam2PromptEncoderConfig(hidden_size=16, image_size=64, patch_size=16, mask_input_channels=4)
    md = Sam2MaskDecoderConfig(hidden_size=16, num_attention_heads=2, mlp_dim=32, iou_head_hidden_dim=16)
    cfg = Sam2Config(vision_config=vc, prompt_encoder_config=pe, mask_decoder_config=md)
    torch.manual_seed(0)
    sd = RecordingSD(Sam2Model(cfg).state_dict())
    params = sam2_image_model_from_hf(sd, total_blocks=total)

    our = dataclasses.replace(SAM2_TEST, hiera=h)
    model = Sam2ImageModel(our)
    g4 = our.prompt.mask_input_size
    init = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 3, 64, 64), jnp.float32),
        mask_inputs=jax.ShapeDtypeStruct((1, 1, g4, g4), jnp.float32),
    )["params"]
    _assert_structure(params, init)
    # shared_image_embedding is the same tensor as the prompt encoder's
    # shared_embedding the converter reads (verified tied in HF Sam2Model).
    _assert_consumed(sd, [r"^shared_image_embedding\."])


def test_sam2_video_hf_released_topology():
    """sam2.1-hiera-large VIDEO checkpoint topology: hiera-L trunk + 4-layer
    memory attention + memory encoder (facebook/sam2.1-hiera-large,
    reference sam2/build_sam.py:117-127)."""
    import torch as _torch
    from transformers import Sam2VideoConfig as HFVideoConfig, Sam2VideoModel as HFVideoModel
    from transformers.models.sam2.configuration_sam2 import (
        Sam2HieraDetConfig,
        Sam2VisionConfig,
    )
    from transformers.models.sam2_video.configuration_sam2_video import (
        Sam2VideoMaskDecoderConfig,
        Sam2VideoPromptEncoderConfig,
    )

    from freepose_tpu.models.sam2.convert import sam2_video_model_from_hf
    from freepose_tpu.models.sam2.hiera import HIERA_L
    from freepose_tpu.models.sam2.mask_decoder import MaskDecoderConfig
    from freepose_tpu.models.sam2.memory import MemoryConfig
    from freepose_tpu.models.sam2.model import Sam2Config
    from freepose_tpu.models.sam2.prompt import PromptConfig
    from freepose_tpu.models.sam2.video import (
        Sam2VideoConfig,
        Sam2VideoModel,
        init_object_state,
    )

    h = dataclasses.replace(
        HIERA_L, embed_dim=8, embed_dim_per_stage=(8, 16, 32, 64),
    )
    total = sum(h.blocks_per_stage)
    d, grid, img = 128, 4, 64  # mem_dim 64 needs hidden >= 64 (2 splits, like released 256/64)
    bb = Sam2HieraDetConfig(
        hidden_size=h.embed_dim, num_attention_heads=1,
        blocks_per_stage=list(h.blocks_per_stage),
        embed_dim_per_stage=list(h.embed_dim_per_stage),
        num_attention_heads_per_stage=list(h.heads_per_stage),
        window_size_per_stage=list(h.window_size_per_stage),
        global_attention_blocks=list(h.global_attention_blocks),
        window_positional_embedding_background_size=list(h.window_pos_bg_size),
        image_size=[img, img],
    )
    vc = Sam2VisionConfig(
        backbone_config=bb, backbone_channel_list=[64, 32, 16, 8], fpn_hidden_size=d,
        backbone_feature_sizes=[[16, 16], [8, 8], [grid, grid]], fpn_top_down_levels=[2, 3],
    )
    pe = Sam2VideoPromptEncoderConfig(hidden_size=d, image_size=img, patch_size=16, mask_input_channels=16)
    md = Sam2VideoMaskDecoderConfig(hidden_size=d, num_attention_heads=2, mlp_dim=32, iou_head_hidden_dim=d)
    cfg = HFVideoConfig(
        vision_config=vc, prompt_encoder_config=pe, mask_decoder_config=md,
        memory_attention_hidden_size=d, memory_attention_num_layers=4,  # released depth
        memory_attention_num_attention_heads=1, memory_attention_downsample_rate=1,
        memory_attention_feed_forward_hidden_size=32,
        memory_attention_rope_feat_sizes=[grid, grid],
        memory_encoder_hidden_size=d, memory_encoder_output_channels=64,
        mask_downsampler_embed_dim=d, memory_fuser_embed_dim=d,
        memory_fuser_intermediate_dim=32, image_size=img,
    )
    _torch.manual_seed(0)
    sd = RecordingSD(HFVideoModel(cfg).state_dict())
    params = sam2_video_model_from_hf(sd, total_blocks=total, mem_layers=4)

    our = Sam2VideoConfig(
        sam=Sam2Config(
            hiera=h,
            prompt=PromptConfig(hidden_size=d, image_size=img, patch_size=16, mask_input_channels=16),
            decoder=MaskDecoderConfig(hidden_size=d, num_heads=2, mlp_dim=32, iou_head_hidden=d),
            fpn_dim=d,
        ),
        mem=MemoryConfig(hidden_size=d, num_layers=4, num_heads=1, downsample_rate=1,
                         ff_hidden=32, rope_feat_size=grid, mem_dim=64, enc_hidden=d,
                         fuser_intermediate=32),
        image_size=img, mem_grid=grid,
    )
    model = Sam2VideoModel(our)
    state0 = init_object_state(our)
    p_cap = our.max_point_prompts

    def full(mdl, pixels):
        pyramid, pos = mdl.embed_frame(pixels)
        st, _ = mdl.track_step(
            state0, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(3),
            points=jnp.zeros((1, 1, p_cap, 2)),
            labels=jnp.full((1, 1, p_cap), -10, jnp.int32), is_init=True,
        )
        # Mask-prompt path too (mask_downsample + prompt mask_embed).
        mdl._mask_as_output(pyramid, jnp.zeros((1, img, img), jnp.float32))
        return mdl.track_step(st, pyramid, pyramid[2], pos[2], jnp.int32(1), jnp.int32(3))

    init = jax.eval_shape(
        lambda key, px: model.init(key, px, method=full),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 3, img, img), jnp.float32),
    )["params"]
    _assert_structure(params, init)
    _assert_consumed(sd, [r"^shared_image_embedding\."])
