"""SAM2 mask decoder: two-way transformer + upscaling + output heads.

Counterpart of the vendored decoder (reference
segment-anything-2/sam2/modeling/sam/mask_decoder.py:1-295 and
transformer.py:44-213): obj-score/IoU/mask tokens cross-attend with the image
embedding in both directions, masks decode through a 4× transposed-conv
upscaler fused with the two high-resolution FPN levels, with the
stability-based dynamic single/multi-mask fallback.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MaskDecoderConfig:
    hidden_size: int = 256
    num_layers: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden: int = 256
    downsample_rate: int = 2
    stability_delta: float = 0.05
    stability_thresh: float = 0.98
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


class DecoderAttention(nn.Module):
    """Attention with optional internal downsampling (SAM style)."""

    hidden: int
    heads: int
    downsample: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        inner = self.hidden // self.downsample
        head_dim = inner // self.heads
        b, p = q.shape[:2]

        def proj(x, name):
            return nn.Dense(inner, dtype=self.dtype, name=name)(x).reshape(
                b * p, -1, self.heads, head_dim
            ).transpose(0, 2, 1, 3)

        qh, kh, vh = proj(q, "q"), proj(k, "k"), proj(v, "v")
        logits = jnp.einsum("bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32)
        logits = logits * (head_dim**-0.5)
        w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", w, vh).transpose(0, 2, 1, 3)
        out = out.reshape(b, p, -1, inner)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out")(out)


class FeedForwardN(nn.Module):
    """proj_in -> act -> hidden layers -> proj_out (SAM FeedForward)."""

    hidden: int
    out: int
    num_layers: int
    sigmoid_output: bool = False
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        actfn = nn.relu if self.act == "relu" else (lambda y: nn.gelu(y, approximate=False))
        x = actfn(nn.Dense(self.hidden, dtype=self.dtype, name="proj_in")(x))
        for i in range(self.num_layers - 2):
            x = actfn(nn.Dense(self.hidden, dtype=self.dtype, name=f"layer{i}")(x))
        x = nn.Dense(self.out, dtype=self.dtype, name="proj_out")(x)
        return jax.nn.sigmoid(x) if self.sigmoid_output else x


class TwoWayBlock(nn.Module):
    cfg: MaskDecoderConfig
    skip_first_pe: bool

    @nn.compact
    def __call__(self, queries, keys, q_pe, k_pe):
        c = self.cfg
        if self.skip_first_pe:
            queries = DecoderAttention(c.hidden_size, c.num_heads, 1, c.dtype, name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + q_pe
            queries = queries + DecoderAttention(
                c.hidden_size, c.num_heads, 1, c.dtype, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(dtype=c.dtype, name="ln1")(queries)

        q = queries + q_pe
        k = keys + k_pe
        queries = queries + DecoderAttention(
            c.hidden_size, c.num_heads, c.downsample_rate, c.dtype, name="cross_t2i"
        )(q, k, keys)
        queries = nn.LayerNorm(dtype=c.dtype, name="ln2")(queries)

        queries = queries + FeedForwardN(
            c.mlp_dim, c.hidden_size, num_layers=c.num_layers, dtype=c.dtype, name="mlp"
        )(queries)
        queries = nn.LayerNorm(dtype=c.dtype, name="ln3")(queries)

        q = queries + q_pe
        k = keys + k_pe
        keys = keys + DecoderAttention(
            c.hidden_size, c.num_heads, c.downsample_rate, c.dtype, name="cross_i2t"
        )(k, q, queries)
        keys = nn.LayerNorm(dtype=c.dtype, name="ln4")(keys)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: MaskDecoderConfig

    @nn.compact
    def __call__(
        self,
        image_embedding: jax.Array,  # [B, G, G, D]
        image_pe: jax.Array,  # [G, G, D]
        sparse_prompts: jax.Array,  # [B, P, S, D]
        dense_prompts: jax.Array,  # [B, G, G, D]
        high_res_feats: tuple[jax.Array, jax.Array],  # s0 [B,4G,4G,D/8], s1 [B,2G,2G,D/4]
        multimask_output: bool,
    ):
        c = self.cfg
        b, g = image_embedding.shape[0], image_embedding.shape[1]
        p = sparse_prompts.shape[1]

        obj_token = self.param("obj_score_token", nn.initializers.normal(0.02), (1, c.hidden_size))
        iou_token = self.param("iou_token", nn.initializers.normal(0.02), (1, c.hidden_size))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(0.02), (c.num_mask_tokens, c.hidden_size)
        )
        out_tokens = jnp.concatenate([obj_token, iou_token, mask_tokens], axis=0).astype(c.dtype)
        tokens = jnp.tile(out_tokens[None, None], (b, p, 1, 1))
        tokens = jnp.concatenate([tokens, sparse_prompts.astype(c.dtype)], axis=2)

        if dense_prompts.ndim == 5:
            # per-prompt dense embeddings [B, P, G, G, D] (m2m mask inputs)
            keys = image_embedding.reshape(b, 1, g * g, -1) + dense_prompts.reshape(
                b, p, g * g, -1
            )
        else:
            src = image_embedding + dense_prompts  # [B, G, G, D]
            keys = jnp.tile(src.reshape(b, 1, g * g, -1), (1, p, 1, 1))
        k_pe = jnp.tile(image_pe.reshape(1, 1, g * g, -1).astype(c.dtype), (b, p, 1, 1))

        queries = tokens
        for i in range(c.num_layers):
            queries, keys = TwoWayBlock(c, skip_first_pe=(i == 0), name=f"block{i}")(
                queries, keys, tokens, k_pe
            )
        q = queries + tokens
        k = keys + k_pe
        queries = queries + DecoderAttention(
            c.hidden_size, c.num_heads, c.downsample_rate, c.dtype, name="final_t2i"
        )(q, k, keys)
        queries = nn.LayerNorm(dtype=c.dtype, name="ln_final")(queries)

        iou_out = queries[:, :, 1]
        mask_tokens_out = queries[:, :, 2 : 2 + c.num_mask_tokens]

        # Upscale the (prompt-conditioned) image embedding 4x, fusing the two
        # high-res pyramid levels.
        src_img = keys.reshape(b * p, g, g, c.hidden_size)
        feat_s0, feat_s1 = high_res_feats
        feat_s0 = jnp.repeat(feat_s0, p, axis=0)
        feat_s1 = jnp.repeat(feat_s1, p, axis=0)
        up = nn.ConvTranspose(
            c.hidden_size // 4, (2, 2), strides=(2, 2), dtype=c.dtype, name="upscale1"
        )(src_img) + feat_s1
        up = nn.gelu(nn.LayerNorm(dtype=c.dtype, name="upscale_ln")(up), approximate=False)
        up = nn.ConvTranspose(
            c.hidden_size // 8, (2, 2), strides=(2, 2), dtype=c.dtype, name="upscale2"
        )(up) + feat_s0
        up = nn.gelu(up, approximate=False)  # [B*P, 4G, 4G, D/8]

        hyper = jnp.stack(
            [
                FeedForwardN(
                    c.hidden_size, c.hidden_size // 8, 3, dtype=c.dtype, name=f"hyper{i}"
                )(mask_tokens_out[:, :, i])
                for i in range(c.num_mask_tokens)
            ],
            axis=2,
        )  # [B, P, T, D/8]
        up_flat = up.reshape(b, p, (4 * g) * (4 * g), c.hidden_size // 8)
        masks = jnp.einsum("bptd,bpnd->bptn", hyper, up_flat).reshape(
            b, p, c.num_mask_tokens, 4 * g, 4 * g
        )

        iou_pred = FeedForwardN(
            c.iou_head_hidden, c.num_mask_tokens, c.iou_head_depth, sigmoid_output=True,
            dtype=c.dtype, name="iou_head",
        )(iou_out)
        obj_logits = FeedForwardN(
            c.hidden_size, 1, 3, dtype=c.dtype, name="obj_head"
        )(queries[:, :, 0])

        if multimask_output:
            masks_out = masks[:, :, 1:]
            iou_pred_out = iou_pred[:, :, 1:]
            sam_tokens = mask_tokens_out[:, :, 1:]
        else:
            masks_out, iou_pred_out = self._dynamic_fallback(masks, iou_pred)
            sam_tokens = mask_tokens_out[:, :, 0:1]
        return masks_out, iou_pred_out, sam_tokens, obj_logits

    def _stability(self, logits: jax.Array) -> jax.Array:
        d = self.cfg.stability_delta
        flat = logits.reshape(*logits.shape[:-2], -1)
        ai = jnp.sum(flat > d, axis=-1).astype(jnp.float32)
        au = jnp.sum(flat > -d, axis=-1).astype(jnp.float32)
        return jnp.where(au > 0, ai / au, 1.0)

    def _dynamic_fallback(self, masks: jax.Array, iou_pred: jax.Array):
        """Single-mask output with stability-based fallback to the best
        multimask candidate (reference mask_decoder.py:247-295)."""
        multi = masks[:, :, 1:]
        multi_iou = iou_pred[:, :, 1:]
        best = jnp.argmax(multi_iou, axis=-1)  # [B, P]
        best_mask = jnp.take_along_axis(multi, best[..., None, None, None], axis=2)
        best_iou = jnp.take_along_axis(multi_iou, best[..., None], axis=2)
        single = masks[:, :, 0:1]
        single_iou = iou_pred[:, :, 0:1]
        stable = self._stability(single) >= self.cfg.stability_thresh  # [B, P, 1]
        out_mask = jnp.where(stable[..., None, None], single, best_mask)
        out_iou = jnp.where(stable, single_iou, best_iou)
        return out_mask, out_iou
