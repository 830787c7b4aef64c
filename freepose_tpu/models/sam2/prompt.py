"""SAM2 prompt encoder: point / box / mask prompts, in Flax.

Counterpart of the vendored prompt encoder (reference
segment-anything-2/sam2/modeling/sam/prompt_encoder.py:1-182) with the random
Fourier positional embedding (position_encoding.py:115-163). Label
convention: 1 pos, 0 neg, -1 not-a-point, 2/3 box corners, -10 padding.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PromptConfig:
    hidden_size: int = 256
    image_size: int = 1024
    patch_size: int = 16
    mask_input_channels: int = 16
    num_point_embeddings: int = 4
    dtype: jnp.dtype = jnp.float32

    @property
    def embed_grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def mask_input_size(self) -> int:
        return 4 * self.image_size // self.patch_size


def fourier_point_embedding(coords01: jax.Array, pe_matrix: jax.Array) -> jax.Array:
    """[..., 2] coords in [0,1] + [2, D/2] Fourier matrix -> [..., D]."""
    c = 2.0 * coords01 - 1.0
    proj = (c @ pe_matrix) * (2.0 * jnp.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of NCHW-style data kept as NHWC here."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype)(x)


class MaskEmbedding(nn.Module):
    cfg: PromptConfig

    @nn.compact
    def __call__(self, masks: jax.Array) -> jax.Array:
        """[B, 1, 4G, 4G] mask logits -> [B, G, G, D] dense embeddings."""
        c = self.cfg.mask_input_channels
        x = masks.transpose(0, 2, 3, 1)
        x = nn.Conv(c // 4, (2, 2), strides=(2, 2), dtype=self.cfg.dtype, name="conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.cfg.dtype, name="ln1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(c, (2, 2), strides=(2, 2), dtype=self.cfg.dtype, name="conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.cfg.dtype, name="ln2")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Conv(self.cfg.hidden_size, (1, 1), dtype=self.cfg.dtype, name="conv3")(x)


class PromptEncoder(nn.Module):
    cfg: PromptConfig

    def setup(self):
        c = self.cfg
        self.pe_matrix = self.param(
            "pe_matrix", nn.initializers.normal(1.0), (2, c.hidden_size // 2)
        )
        self.point_embed = self.param(
            "point_embed", nn.initializers.normal(0.02), (c.num_point_embeddings, c.hidden_size)
        )
        self.not_a_point = self.param("not_a_point", nn.initializers.normal(0.02), (1, c.hidden_size))
        self.no_mask = self.param("no_mask", nn.initializers.normal(0.02), (1, c.hidden_size))
        self.mask_embed = MaskEmbedding(c)

    def embed_points(self, points: jax.Array, labels: jax.Array) -> jax.Array:
        """points [B, P, N, 2] pixel coords; labels [B, P, N] -> [B, P, N, D]."""
        c = self.cfg
        pts = (points + 0.5) / c.image_size
        pe = fourier_point_embedding(pts, self.pe_matrix).astype(c.dtype)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, self.not_a_point[0].astype(c.dtype), pe)
        pe = jnp.where(lab == -10, 0.0, pe)
        typed = self.point_embed[jnp.clip(labels, 0, None)].astype(c.dtype)
        return pe + typed * (labels[..., None] >= 0)

    def embed_boxes(self, boxes: jax.Array) -> jax.Array:
        """boxes [B, P, 4] xyxy -> [B, P, 3, D] (2 corners + pad point)."""
        c = self.cfg
        corners = (boxes.reshape(*boxes.shape[:2], 2, 2) + 0.5) / c.image_size
        pe = fourier_point_embedding(corners, self.pe_matrix).astype(c.dtype)
        pe = pe.at[:, :, 0].add(self.point_embed[2].astype(c.dtype))
        pe = pe.at[:, :, 1].add(self.point_embed[3].astype(c.dtype))
        pad = jnp.broadcast_to(self.not_a_point[0].astype(c.dtype), pe[:, :, :1].shape)
        return jnp.concatenate([pe, pad], axis=2)

    def dense_embedding(self, batch: int, masks: jax.Array | None) -> jax.Array:
        """-> [B, G, G, D] dense prompt (mask embedding or learned no-mask).
        Per-PROMPT mask inputs [B, P, 1, 4G, 4G] (the m2m refinement path of
        the automatic mask generator) return [B, P, G, G, D]."""
        c = self.cfg
        if masks is not None:
            if masks.ndim == 5:
                b, p = masks.shape[:2]
                emb = self.mask_embed(masks.reshape(b * p, *masks.shape[2:]))
                return emb.reshape(b, p, *emb.shape[1:])
            return self.mask_embed(masks)
        g = c.embed_grid
        return jnp.broadcast_to(
            self.no_mask[0].astype(c.dtype), (batch, g, g, c.hidden_size)
        )

    def __call__(
        self,
        points: jax.Array | None = None,
        labels: jax.Array | None = None,
        boxes: jax.Array | None = None,
        masks: jax.Array | None = None,
    ):
        sparse = None
        batch = 1
        if points is not None:
            batch = points.shape[0]
            if boxes is None:
                # pad with one not-a-point (matches reference pad=True)
                points = jnp.pad(points, ((0, 0), (0, 0), (0, 1), (0, 0)))
                labels = jnp.pad(labels, ((0, 0), (0, 0), (0, 1)), constant_values=-1)
            sparse = self.embed_points(points, labels)
        if boxes is not None:
            batch = boxes.shape[0]
            be = self.embed_boxes(boxes)
            sparse = be if sparse is None else jnp.concatenate([sparse, be], axis=2)
        dense = self.dense_embedding(batch, masks)
        return sparse, dense

    def image_wide_pe(self) -> jax.Array:
        """[G, G, D] sine PE over the embedding grid (Sam2Model
        get_image_wide_positional_embeddings)."""
        g = self.cfg.embed_grid
        y = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        x = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(x, y), axis=-1)  # [g, g, 2] (x, y)
        return fourier_point_embedding(grid, self.pe_matrix)
