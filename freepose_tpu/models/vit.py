"""Shared ViT building blocks (Flax linen), used by DINOv2 / CLIP / SAM heads.

TPU-first: all attention is batched dense matmuls in bf16-friendly layouts
(XLA maps them straight onto the MXU; a fused Pallas attention kernel can be
swapped in via `attention_fn` without touching model code). No dropout —
every model in this framework is inference-only, like the reference
(torch.inference_mode throughout, e.g. reference src/pipeline/retrieval/
dino.py:15).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """[B, H, N, d] q/k/v -> [B, H, N, d]. fp32 softmax accumulator."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", weights, v)


class MultiHeadAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = self.attention_fn or dot_product_attention
        out = attn(q, k, v, scale=head_dim**-0.5)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32
    act: Callable = nn.gelu

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.constant(self.init_value), (self.dim,))
        return x * gamma.astype(self.dtype)


class TransformerBlock(nn.Module):
    """Pre-norm ViT block with optional LayerScale (DINOv2-style)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale: bool = True
    dtype: jnp.dtype = jnp.float32
    attention_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = MultiHeadAttention(
            self.dim, self.num_heads, dtype=self.dtype, attention_fn=self.attention_fn, name="attn"
        )(h)
        if self.layerscale:
            h = LayerScale(self.dim, dtype=self.dtype, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = Mlp(self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(h)
        if self.layerscale:
            h = LayerScale(self.dim, dtype=self.dtype, name="ls2")(h)
        return x + h


def interpolate_pos_embed(pos_embed: jax.Array, grid_hw: tuple[int, int], src_grid: int) -> jax.Array:
    """Bicubic-resample [1, src*src, D] patch position embeddings to a new
    (h, w) patch grid (antialiased on downsampling, matching torch
    F.interpolate(..., mode='bicubic', antialias=True))."""
    h, w = grid_hw
    if (h, w) == (src_grid, src_grid):
        return pos_embed
    d = pos_embed.shape[-1]
    grid = pos_embed.reshape(1, src_grid, src_grid, d)
    resized = jax.image.resize(grid, (1, h, w, d), method="bicubic", antialias=True)
    return resized.reshape(1, h * w, d)
