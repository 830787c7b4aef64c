"""Hiera trunk + FPN neck for SAM2, in Flax.

TPU-native re-implementation of the vendored SAM2 image encoder (reference
segment-anything-2/sam2/modeling/backbones/hieradet.py:1-291 and
image_encoder.py:45-133): hierarchical ViT with windowed attention, global
attention at selected blocks, max-pool query downsampling at stage changes,
windowed positional embeddings, and a top-down FPN neck producing the
[256-d] feature pyramid with sine position encodings.

All shapes static per input resolution; window partitioning is pure reshapes
(XLA-fuses); attention is dense bf16-friendly matmuls on the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 144  # hiera-large (sam2_hiera_l.yaml)
    blocks_per_stage: tuple = (2, 6, 36, 4)
    embed_dim_per_stage: tuple = (144, 288, 576, 1152)
    heads_per_stage: tuple = (2, 4, 8, 16)
    window_size_per_stage: tuple = (8, 4, 16, 8)
    global_attention_blocks: tuple = (23, 33, 43)
    window_pos_bg_size: tuple = (7, 7)
    query_stride: int = 2
    num_query_pool_stages: int = 3
    mlp_ratio: float = 4.0
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # Pallas flash attention in global blocks (TPU)


HIERA_L = HieraConfig()
# The other released sizes (reference sam2_configs/sam2_hiera_{t,s,b+}.yaml +
# hieradet.py defaults for fields the yamls leave unset).
HIERA_T = HieraConfig(
    embed_dim=96,
    blocks_per_stage=(1, 2, 7, 2),
    embed_dim_per_stage=(96, 192, 384, 768),
    heads_per_stage=(1, 2, 4, 8),
    window_size_per_stage=(8, 4, 14, 7),
    global_attention_blocks=(5, 7, 9),
    window_pos_bg_size=(7, 7),
)
HIERA_S = HieraConfig(
    embed_dim=96,
    blocks_per_stage=(1, 2, 11, 2),
    embed_dim_per_stage=(96, 192, 384, 768),
    heads_per_stage=(1, 2, 4, 8),
    window_size_per_stage=(8, 4, 14, 7),
    global_attention_blocks=(7, 10, 13),
    window_pos_bg_size=(7, 7),
)
HIERA_B_PLUS = HieraConfig(
    embed_dim=112,
    blocks_per_stage=(2, 3, 16, 3),
    embed_dim_per_stage=(112, 224, 448, 896),
    heads_per_stage=(2, 4, 8, 16),
    window_size_per_stage=(8, 4, 14, 7),
    global_attention_blocks=(12, 16, 20),
    window_pos_bg_size=(14, 14),
)
HIERA_TEST = HieraConfig(
    embed_dim=8,
    blocks_per_stage=(1, 1, 1, 1),
    embed_dim_per_stage=(8, 16, 32, 64),
    heads_per_stage=(1, 2, 4, 8),
    window_size_per_stage=(4, 2, 2, 2),
    global_attention_blocks=(2,),
    window_pos_bg_size=(2, 2),
)


def window_partition(x: jax.Array, ws: int) -> tuple[jax.Array, tuple[int, int]]:
    """[B, H, W, C] -> [B*nw, ws, ws, C] with zero padding."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def window_unpartition(windows: jax.Array, ws: int, pad_hw: tuple[int, int], hw: tuple[int, int]) -> jax.Array:
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // ((hp // ws) * (wp // ws))
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, -1)[:, :h, :w]


def _max_pool2(x: jax.Array, stride: int) -> jax.Array:
    """[B, H, W, C] max pool kernel=stride (floor mode)."""
    b, h, w, c = x.shape
    h2, w2 = h // stride, w // stride
    x = x[:, : h2 * stride, : w2 * stride]
    x = x.reshape(b, h2, stride, w2, stride, c)
    return x.max(axis=(2, 4))


class MultiScaleAttention(nn.Module):
    dim_out: int
    num_heads: int
    query_stride: int | None
    dtype: jnp.dtype
    use_flash: bool = False  # Pallas flash kernel (global-attention blocks, TPU)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.query_stride:
            q = q.reshape(b, h, w, self.num_heads * head_dim)
            q = _max_pool2(q, self.query_stride)
            h, w = q.shape[1], q.shape[2]
            q = q.reshape(b, h * w, self.num_heads, head_dim)
        if self.use_flash:
            # Global-attention blocks see 4096 tokens at 1024² input — the
            # dense [H, N, N] score tensor is the trunk's main HBM cost;
            # the fused kernel never materializes it (SURVEY.md §2.6.3).
            from freepose_tpu.ops.attention import flash_attention_auto

            out = flash_attention_auto(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                head_dim**-0.5,
            ).transpose(0, 2, 1, 3).reshape(b, h, w, self.dim_out)
        else:
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
            ) * (head_dim**-0.5)
            weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", weights, v).reshape(b, h, w, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class FeedForward(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class MultiScaleBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    window_size: int  # 0 = global attention
    query_stride: int | None
    mlp_ratio: float
    dtype: jnp.dtype
    use_flash: bool = False
    # pre_windowed: x arrives ALREADY partitioned as [B·nW, ws, ws, C] (a
    # window-resident stage run, see Hiera.__call__) — skip the per-block
    # partition/unpartition pair. `pad_mask` ([nW, ws, ws, 1] float, or None
    # when the map divides the window) re-zeroes pad tokens post-norm,
    # reproducing the classic path's fresh zero padding EXACTLY: LayerNorm
    # and the qkv bias see the same zero rows the re-partition would insert.
    pre_windowed: bool = False
    pad_mask: jax.Array | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.pre_windowed:
            if self.pad_mask is not None:
                nw = self.pad_mask.shape[0]
                h = (h.reshape(-1, nw, *h.shape[1:])
                     * self.pad_mask[None].astype(h.dtype)).reshape(h.shape)
            h = MultiScaleAttention(
                self.dim_out, self.num_heads, None, self.dtype,
                use_flash=False, name="attn",
            )(h)
            x = residual + h
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
            return x + FeedForward(
                int(self.dim_out * self.mlp_ratio), self.dim_out, self.dtype, name="mlp"
            )(h)
        if self.dim != self.dim_out:
            proj = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(h)
            residual = _max_pool2(proj, self.query_stride) if self.query_stride else proj

        ws = self.window_size
        hw = (h.shape[1], h.shape[2])
        pad_hw = hw
        if ws > 0:
            h, pad_hw = window_partition(h, ws)
        h = MultiScaleAttention(
            self.dim_out, self.num_heads, self.query_stride, self.dtype,
            use_flash=self.use_flash and ws == 0 and not self.query_stride,
            name="attn",
        )(h)
        if self.query_stride:
            ws = ws // self.query_stride
            out_hw = (residual.shape[1], residual.shape[2])
            pad_h = (ws - out_hw[0] % ws) % ws if ws > 0 else 0
            pad_w = (ws - out_hw[1] % ws) % ws if ws > 0 else 0
            pad_hw = (out_hw[0] + pad_h, out_hw[1] + pad_w)
            hw = out_hw
        if self.window_size > 0:
            h = window_unpartition(h, ws, pad_hw, hw)
        x = residual + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        return x + FeedForward(
            int(self.dim_out * self.mlp_ratio), self.dim_out, self.dtype, name="mlp"
        )(h)


class _PatchEmbed(nn.Module):
    """Overlapping patch embed with the same param tree as nn.Conv
    ("kernel"/"bias"). On the 7×7/stride-4/pad-3 production shape it runs as
    an EXACT space-to-depth factorization: kernel zero-pads to 8×8, the
    input re-lays-out into 4×4-phase blocks (3→48 channels), and the conv
    becomes a 2×2/48-channel VALID conv — a 192-deep MXU contraction instead
    of a lane-starved C_in=3 one (profiled 3.2 ms of a 37.6 ms trunk
    forward at 1024²). Zero taps contribute zero, so outputs are
    bit-compatible with the direct convolution up to summation order."""

    dim: int
    kernel: int
    stride: int
    padding: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, H, W, C]
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, c_in, self.dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        k, s, p = self.kernel, self.stride, self.padding
        h, w = x.shape[1], x.shape[2]
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if s == 4 and k == 7 and p == 3 and h % 4 == 0 and w % 4 == 0:
            kp = jnp.pad(kd, ((0, 1), (0, 1), (0, 0), (0, 0)))  # 8×8, zero taps
            xp = jnp.pad(xd, ((0, 0), (3, 1), (3, 1), (0, 0)))
            b = x.shape[0]
            hb, wb = (h + 4) // 4, (w + 4) // 4
            xs = xp.reshape(b, hb, 4, wb, 4, c_in).transpose(0, 1, 3, 2, 4, 5)
            xs = xs.reshape(b, hb, wb, 16 * c_in)
            ks = kp.reshape(2, 4, 2, 4, c_in, self.dim).transpose(0, 2, 1, 3, 4, 5)
            ks = ks.reshape(2, 2, 16 * c_in, self.dim)
            out = jax.lax.conv_general_dilated(
                xs, ks, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            out = jax.lax.conv_general_dilated(
                xd, kd, window_strides=(s, s), padding=[(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return out + bias.astype(self.dtype)


class Hiera(nn.Module):
    """Returns the per-stage feature maps [B, H_s, W_s, C_s] (stage ends)."""

    config: HieraConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> list[jax.Array]:
        cfg = self.config
        x = _PatchEmbed(
            cfg.embed_dim, cfg.patch_kernel, cfg.patch_stride,
            cfg.patch_padding, cfg.dtype,
            name="patch_embed",
        )(pixels.transpose(0, 2, 3, 1))
        h, w = x.shape[1], x.shape[2]

        # Windowed positional embedding: background embedding bicubically
        # resized to (h, w) plus a tiled window embedding
        # (reference hieradet.py:265-273).
        pos_bg = self.param(
            "pos_embed", nn.initializers.zeros, (1, *cfg.window_pos_bg_size, cfg.embed_dim)
        )
        ws0 = cfg.window_size_per_stage[0]
        pos_win = self.param("pos_embed_window", nn.initializers.zeros, (1, ws0, ws0, cfg.embed_dim))
        from freepose_tpu.ops.sampling import resize_bicubic_torch

        # NHWC -> NCHW for the separable bicubic over (H, W), then back.
        pos = resize_bicubic_torch(pos_bg.transpose(0, 3, 1, 2), (h, w)).transpose(0, 2, 3, 1)
        pos = pos + jnp.tile(pos_win, (1, h // ws0, w // ws0, 1))
        x = x + pos.astype(cfg.dtype)

        # Window-RESIDENT stage runs: consecutive same-window blocks keep x
        # in the partitioned [B·nW, ws, ws, C] layout — everything between
        # attentions (LayerNorm, MLP, residuals) is per-token, so one
        # partition/unpartition pair serves a whole run instead of one pair
        # per block (the per-block transposes were 26% of the SAM2 chunk's
        # device time: copies 7.1 + reshapes 4.5 ms/frame of 44.8, round-5
        # trace). Pad tokens are re-zeroed post-norm via a static mask, so
        # numerics equal the classic per-block path exactly (parity-tested).
        win = None  # (ws, pad_hw, hw) when x is window-partitioned
        outputs = []
        total_idx = 0
        for stage_idx, n_blocks in enumerate(cfg.blocks_per_stage):
            for block_idx in range(n_blocks):
                first = stage_idx > 0 and block_idx == 0
                dim = cfg.embed_dim_per_stage[stage_idx - 1] if first else cfg.embed_dim_per_stage[stage_idx]
                ws = cfg.window_size_per_stage[stage_idx - 1] if first else cfg.window_size_per_stage[stage_idx]
                if total_idx in cfg.global_attention_blocks:
                    ws = 0
                q_stride = (
                    cfg.query_stride
                    if first and stage_idx <= cfg.num_query_pool_stages
                    else None
                )
                plain = ws > 0 and q_stride is None and dim == cfg.embed_dim_per_stage[stage_idx]
                if win is not None and (not plain or win[0] != ws):
                    x = x.reshape(x.shape[0], win[0], win[0], x.shape[-1])
                    x = window_unpartition(x, win[0], win[1], win[2])
                    win = None
                if plain and win is None:
                    hw = (x.shape[1], x.shape[2])
                    x, pad_hw = window_partition(x, ws)
                    # Flat token layout [B·nW, 1, ws², C] (free reshape):
                    # LayerNorm/MLP tile over ws²-row blocks instead of
                    # ws-row fragments.
                    x = x.reshape(x.shape[0], 1, ws * ws, x.shape[-1])
                    win = (ws, pad_hw, hw)
                if win is not None:
                    pad_mask = None
                    if win[1] != win[2]:
                        hp, wp = win[1]
                        hh, ww = win[2]
                        m = np.zeros((hp, wp, 1), np.float32)
                        m[:hh, :ww] = 1.0
                        m = m.reshape(hp // ws, ws, wp // ws, ws, 1).transpose(0, 2, 1, 3, 4)
                        pad_mask = jnp.asarray(m.reshape(-1, 1, ws * ws, 1))
                    x = MultiScaleBlock(
                        dim=dim,
                        dim_out=cfg.embed_dim_per_stage[stage_idx],
                        num_heads=cfg.heads_per_stage[stage_idx],
                        window_size=ws,
                        query_stride=None,
                        mlp_ratio=cfg.mlp_ratio,
                        dtype=cfg.dtype,
                        use_flash=cfg.use_flash,
                        pre_windowed=True,
                        pad_mask=pad_mask,
                        name=f"block{total_idx}",
                    )(x)
                else:
                    x = MultiScaleBlock(
                        dim=dim,
                        dim_out=cfg.embed_dim_per_stage[stage_idx],
                        num_heads=cfg.heads_per_stage[stage_idx],
                        window_size=ws,
                        query_stride=q_stride,
                        mlp_ratio=cfg.mlp_ratio,
                        dtype=cfg.dtype,
                        use_flash=cfg.use_flash,
                        name=f"block{total_idx}",
                    )(x)
                total_idx += 1
            if win is not None:
                x = x.reshape(x.shape[0], win[0], win[0], x.shape[-1])
                x = window_unpartition(x, win[0], win[1], win[2])
                win = None
            outputs.append(x)
        return outputs


def sine_position_encoding(shape: tuple[int, int], dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """[H, W, dim] normalized sine/cosine position features (reference
    sam2/modeling/position_encoding.py PositionEmbeddingSine, normalize=True).
    """
    h, w = shape
    num_pos_feats = dim // 2
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None].repeat(w, 1)
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :].repeat(h, 0)
    eps = 1e-6
    y = y / (h + eps) * 2 * jnp.pi
    x = x / (w + eps) * 2 * jnp.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class FpnNeck(nn.Module):
    """Top-down FPN over hiera stage outputs -> list (high→low res) of
    ([B, H, W, fpn_dim] features, [H, W, fpn_dim] sine positions)."""

    fpn_dim: int = 256
    top_down_levels: Sequence[int] = (2, 3)
    num_feature_levels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, stage_feats: list[jax.Array]):
        n = len(stage_feats) - 1
        feats: list = [None] * (n + 1)
        prev = None
        for i in range(n, -1, -1):
            lateral = nn.Conv(self.fpn_dim, (1, 1), dtype=self.dtype, name=f"conv{n - i}")(stage_feats[i])
            if i in self.top_down_levels and i != n and prev is not None:
                b, h, w, c = prev.shape
                up = jax.image.resize(prev.astype(jnp.float32), (b, h * 2, w * 2, c), method="nearest")
                prev = lateral + up.astype(lateral.dtype)
            else:
                prev = lateral
            feats[i] = prev
        # Keep the num_feature_levels highest-resolution levels, ordered
        # high-res -> low-res (stride 4, 8, 16); the stride-16 level is the
        # main image embedding.
        chosen = feats[: self.num_feature_levels]
        pos = [sine_position_encoding(f.shape[1:3], self.fpn_dim) for f in chosen]
        return chosen, pos
