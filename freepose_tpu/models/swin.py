"""Swin Transformer backbone in Flax (for GroundingDINO).

The reference's GroundingDINO detector runs on a Swin-B vision backbone
(reference scripts/extract_proposals_ground.py:48 loads
IDEA-Research/grounding-dino-base, whose backbone is Swin-B-384: embed 128,
depths (2,2,18,2), heads (4,8,16,32), window 12). Hierarchical windowed
attention with relative position bias, shifted windows on alternate blocks,
and 2×2 patch-merging downsamples; returns the requested stage feature maps
(NCHW) with per-stage layer norms, matching HF SwinBackbone.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96  # swin-tiny
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_stages: tuple = (1, 2, 3)  # 0-based stage indices to emit
    always_partition: bool = True  # HF SwinBackbone semantics
    dtype: jnp.dtype = jnp.float32

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2**i)


SWIN_TEST = SwinConfig(embed_dim=16, depths=(1, 1, 2), num_heads=(1, 2, 4), window_size=4, out_stages=(1, 2))

# The grounding-dino-base backbone (Swin-B pretrained at 384, window 12) —
# the reference's production detector size.
SWIN_B = SwinConfig(
    embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
    window_size=12, out_stages=(1, 2, 3),
)


def _rel_pos_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)  # [w², w²]


def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """[nW, w², w²] additive mask for shifted windows (HF get_attn_mask)."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // window, window, wp // window, window).transpose(0, 2, 1, 3)
    win = win.reshape(-1, window * window)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float
    dtype: jnp.dtype
    always_partition: bool = True  # backbone mode (HF SwinBackbone passes
    # always_partition=True, modeling_swin.py:1242): keep the configured
    # window + shift even when the map is no bigger than the window.

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, H, W, C]
        b, h, w, c = x.shape
        if self.always_partition:
            window, shift = self.window, self.shift
        else:
            window = min(self.window, h, w)
            shift = 0 if min(h, w) <= self.window else self.shift

        res = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        pad_h = (window - h % window) % window
        pad_w = (window - w % window) % window
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        # window partition
        xw = x.reshape(b, hp // window, window, wp // window, window, c)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)

        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(xw)
        qkv = qkv.reshape(xw.shape[0], xw.shape[1], 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        logits = logits * (head_dim**-0.5)

        table = self.param(
            "rel_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        # Relative-position indices for the (possibly clipped) window, offset
        # into the full-size bias table.
        coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
        flat = coords.reshape(2, -1)
        rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
        rel[:, :, 0] += self.window - 1
        rel[:, :, 1] += self.window - 1
        rel[:, :, 0] *= 2 * self.window - 1
        idx = rel.sum(-1)
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(
            window * window, window * window, self.num_heads
        )
        logits = logits + bias.transpose(2, 0, 1)[None].astype(jnp.float32)

        if shift > 0:
            mask = jnp.asarray(_shift_attn_mask(hp, wp, window, shift))  # [nW, n, n]
            n_windows = mask.shape[0]
            logits = logits.reshape(b, n_windows, self.num_heads, window * window, window * window)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(-1, self.num_heads, window * window, window * window)

        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(
            xw.shape[0], xw.shape[1], c
        )
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)

        out = out.reshape(b, hp // window, wp // window, window, window, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if shift > 0:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        out = out[:, :h, :w]
        x = res + out

        res = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        x = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(c, dtype=self.dtype, name="fc2")(x)
        return res + x


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, H, W, C] -> [B, H/2, W/2, 2C]
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        merged = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        merged = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(merged)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(merged)


class SwinBackbone(nn.Module):
    config: SwinConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> list[jax.Array]:
        """[B, 3, H, W] -> list of [B, H_s, W_s, C_s] for out_stages."""
        cfg = self.config
        x = nn.Conv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), dtype=cfg.dtype, name="patch_embed",
        )(pixels.transpose(0, 2, 3, 1))
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="embed_norm")(x)

        outputs = []
        for stage, depth in enumerate(cfg.depths):
            for blk in range(depth):
                x = SwinBlock(
                    cfg.stage_dim(stage), cfg.num_heads[stage], cfg.window_size,
                    shift=0 if blk % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio, dtype=cfg.dtype,
                    always_partition=cfg.always_partition,
                    name=f"stage{stage}_block{blk}",
                )(x)
            if stage in cfg.out_stages:
                normed = nn.LayerNorm(
                    epsilon=1e-5, dtype=cfg.dtype, name=f"out_norm{stage}"
                )(x)
                outputs.append(normed)
            if stage + 1 < len(cfg.depths):
                x = PatchMerging(cfg.stage_dim(stage), cfg.dtype, name=f"downsample{stage}")(x)
        return outputs
