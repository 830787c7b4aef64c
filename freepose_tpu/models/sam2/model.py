"""SAM2 image model: Hiera encoder + prompt encoder + mask decoder.

Equivalent of the vendored SAM2Base image path (reference
segment-anything-2/sam2/modeling/sam2_base.py:251-475) — embed the image once,
then decode any number of point/box/mask prompts against the cached pyramid
(the reference's SAM2ImagePredictor.set_image/predict usage,
sam2_image_predictor.py:83,234).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from freepose_tpu.models.sam2.hiera import FpnNeck, Hiera, HieraConfig, HIERA_L
from freepose_tpu.models.sam2.mask_decoder import MaskDecoder, MaskDecoderConfig
from freepose_tpu.models.sam2.prompt import PromptConfig, PromptEncoder


@dataclasses.dataclass(frozen=True)
class Sam2Config:
    hiera: HieraConfig = HIERA_L
    prompt: PromptConfig = PromptConfig()
    decoder: MaskDecoderConfig = MaskDecoderConfig()
    fpn_dim: int = 256
    dtype: jnp.dtype = jnp.float32


SAM2_TEST = Sam2Config(
    hiera=HieraConfig(
        embed_dim=8, blocks_per_stage=(1, 1, 1, 1), embed_dim_per_stage=(8, 16, 32, 64),
        heads_per_stage=(1, 2, 4, 8), window_size_per_stage=(4, 4, 4, 4),
        global_attention_blocks=(9,), window_pos_bg_size=(2, 2),
    ),
    prompt=PromptConfig(hidden_size=16, image_size=64, patch_size=16, mask_input_channels=4),
    decoder=MaskDecoderConfig(hidden_size=16, num_heads=2, mlp_dim=32, iou_head_hidden=16),
    fpn_dim=16,
)

IMAGE_MEAN = (0.485, 0.456, 0.406)
IMAGE_STD = (0.229, 0.224, 0.225)


def sam2_normalize(images: jax.Array) -> jax.Array:
    """[B, 3, H, W] in [0,1] -> normalized (reference sam2 transforms)."""
    mean = jnp.asarray(IMAGE_MEAN, images.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGE_STD, images.dtype).reshape(1, 3, 1, 1)
    return (images - mean) / std


class Sam2ImageModel(nn.Module):
    config: Sam2Config

    def setup(self):
        c = self.config
        self.backbone = Hiera(c.hiera)
        self.neck = FpnNeck(fpn_dim=c.fpn_dim, dtype=c.dtype)
        self.prompt_encoder = PromptEncoder(c.prompt)
        self.decoder = MaskDecoder(c.decoder)
        self.no_memory_embedding = self.param(
            "no_memory_embedding", nn.initializers.zeros, (1, 1, c.fpn_dim)
        )
        # High-res skip projections, applied once per image (HF keeps them in
        # the decoder as conv_s0/s1; reference sam2_base.py:88-96).
        self.conv_s0 = nn.Conv(c.decoder.hidden_size // 8, (1, 1), dtype=c.dtype, name="conv_s0")
        self.conv_s1 = nn.Conv(c.decoder.hidden_size // 4, (1, 1), dtype=c.dtype, name="conv_s1")

    def embed_image(self, pixels: jax.Array, with_memory_placeholder: bool = True):
        """[B, 3, H, W] normalized pixels -> pyramid [s0, s1, s2] (NHWC) and
        their sine position encodings."""
        stages = self.backbone(pixels)
        feats, pos = self.neck(stages)
        s0 = self.conv_s0(feats[0])
        s1 = self.conv_s1(feats[1])
        s2 = feats[2]
        if with_memory_placeholder:
            s2 = s2 + self.no_memory_embedding[0, 0].astype(s2.dtype)
        return [s0, s1, s2], pos

    def raw_pyramid(self, pixels: jax.Array):
        """Backbone+neck features without the SAM-head projections — the
        memory-attention path consumes these (video mode)."""
        stages = self.backbone(pixels)
        return self.neck(stages)

    def decode_masks(
        self,
        pyramid: list[jax.Array],
        points: jax.Array | None = None,
        labels: jax.Array | None = None,
        boxes: jax.Array | None = None,
        mask_inputs: jax.Array | None = None,
        multimask_output: bool = True,
    ):
        """Prompt + decode against a cached pyramid.

        Returns (low_res_masks [B, P, M, 4G, 4G], iou [B, P, M],
        sam_tokens [B, P, M, D], obj_logits [B, P, 1]).
        """
        s0, s1, s2 = pyramid
        b = s2.shape[0]
        if points is None and boxes is None:
            points = jnp.zeros((b, 1, 1, 2), s2.dtype)
            labels = -jnp.ones((b, 1, 1), jnp.int32)
        if points is not None and labels is None:
            labels = jnp.ones(points.shape[:3], jnp.int32)
        sparse, dense = self.prompt_encoder(points, labels, boxes, mask_inputs)
        image_pe = self.prompt_encoder.image_wide_pe()
        return self.decoder(
            s2, image_pe, sparse, dense, (s0, s1), multimask_output
        )

    def __call__(
        self,
        pixels: jax.Array,
        points: jax.Array | None = None,
        labels: jax.Array | None = None,
        boxes: jax.Array | None = None,
        mask_inputs: jax.Array | None = None,
        multimask_output: bool = True,
    ):
        pyramid, _ = self.embed_image(pixels)
        return self.decode_masks(pyramid, points, labels, boxes, mask_inputs, multimask_output)
