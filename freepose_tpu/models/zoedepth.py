"""Metric monocular depth (ZoeDepth-style): ViT-DPT decoder + adaptive bins.

TPU-native counterpart of the ZoeD_N model the reference pulls from torch.hub
for metric scale correction and depth_pred precomputation (reference
scripts/compute_scale_video.py:40, scripts/generate_depth_zoe.py:14-31).

Architecture (the ZoeDepth/AdaBins family): a ViT backbone tapped at 4
depths, DPT-style reassembly to a multi-scale pyramid with fusion blocks, and
a metric-bins head — an image-adaptive set of depth-bin centres plus
per-pixel softmax over bins; depth = Σ p_i · c_i, bounded to
[min_depth, max_depth]. The original's BEiT-384 backbone is swapped for the
registers-free ViT stack shared with this framework (weight conversion from
the released ZoeD checkpoints is a planned round-2 item; the head and decoder
are conversion-ready).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.models.vit import TransformerBlock
from freepose_tpu.ops.sampling import resize_bilinear


@dataclasses.dataclass(frozen=True)
class DepthConfig:
    hidden_size: int = 768
    num_layers: int = 24
    num_heads: int = 12
    patch_size: int = 16
    image_size: int = 384
    taps: tuple = (5, 11, 17, 23)  # blocks feeding the DPT decoder
    decoder_dim: int = 256
    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0
    dtype: jnp.dtype = jnp.float32


DEPTH_TEST = DepthConfig(
    hidden_size=32, num_layers=4, num_heads=2, patch_size=16, image_size=64,
    taps=(0, 1, 2, 3), decoder_dim=16, n_bins=8,
)


class FusionBlock(nn.Module):
    dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array | None) -> jax.Array:
        if skip is not None:
            h = nn.relu(skip)
            h = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="res1a")(h)
            h = nn.relu(h)
            h = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="res1b")(h)
            x = x + h
        h = nn.relu(x)
        h = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="res2a")(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="res2b")(h)
        x = x + h
        b, hh, ww, c = x.shape
        x = jax.image.resize(x, (b, hh * 2, ww * 2, c), method="bilinear")
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="out_proj")(x)


class MetricDepth(nn.Module):
    config: DepthConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """[B, 3, H, W] normalized -> [B, H, W] metric depth."""
        c = self.config
        b, _, h, w = images.shape
        gh, gw = h // c.patch_size, w // c.patch_size

        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), dtype=c.dtype, name="patch_embed",
        )(images.transpose(0, 2, 3, 1)).reshape(b, gh * gw, c.hidden_size)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, (c.image_size // c.patch_size) ** 2, c.hidden_size),
        )
        if pos.shape[1] != gh * gw:
            from freepose_tpu.models.vit import interpolate_pos_embed

            pos = interpolate_pos_embed(pos, (gh, gw), c.image_size // c.patch_size)
        x = x + pos.astype(c.dtype)

        taps = []
        for i in range(c.num_layers):
            x = TransformerBlock(
                c.hidden_size, c.num_heads, layerscale=False, dtype=c.dtype, name=f"block{i}"
            )(x)
            if i in c.taps:
                taps.append(x)

        # DPT reassembly: taps -> pyramid at strides (4, 8, 16, 32) rel. input.
        scales = (4.0, 2.0, 1.0, 0.5)
        pyramid = []
        for i, (t, s) in enumerate(zip(taps, scales)):
            f = t.reshape(b, gh, gw, c.hidden_size)
            f = nn.Conv(c.decoder_dim, (3, 3), dtype=c.dtype, name=f"reassemble{i}")(f)
            nh, nw = int(gh * s), int(gw * s)
            f = jax.image.resize(f, (b, nh, nw, c.decoder_dim), method="bilinear")
            pyramid.append(f)

        # Top-down fusion.
        feat = None
        for i in range(3, -1, -1):
            feat = FusionBlock(c.decoder_dim, c.dtype, name=f"fusion{i}")(
                pyramid[i] if feat is None else feat, None if feat is None else pyramid[i]
            )
        # feat is at stride 2 after the last 2x upsample.

        # Metric bins: image-adaptive bin centres + per-pixel bin weights.
        bottleneck = jnp.mean(pyramid[-1], axis=(1, 2))  # [B, D]
        widths = nn.Dense(c.n_bins, dtype=c.dtype, name="bin_regressor")(
            nn.relu(nn.Dense(c.decoder_dim, dtype=c.dtype, name="bin_hidden")(bottleneck))
        )
        widths = jax.nn.softmax(widths, axis=-1)  # normalized bin widths
        edges = c.min_depth + jnp.cumsum(widths, axis=-1) * (c.max_depth - c.min_depth)
        centers = edges - 0.5 * widths * (c.max_depth - c.min_depth)  # [B, K]

        logits = nn.Conv(c.n_bins, (3, 3), dtype=c.dtype, name="bin_logits")(feat)
        probs = jax.nn.softmax(logits, axis=-1)  # [B, h2, w2, K]
        depth = jnp.einsum("bhwk,bk->bhw", probs, centers)
        return resize_bilinear(depth, (h, w))


class MetricDepthEstimator:
    """Prediction front end (torch.hub ZoeD_N equivalent)."""

    IMAGE_MEAN = (0.485, 0.456, 0.406)
    IMAGE_STD = (0.229, 0.224, 0.225)

    def __init__(self, config: DepthConfig | None = None, params=None, seed: int = 0):
        import os

        self.config = config or (DEPTH_TEST if os.environ.get("FREEPOSE_TINY_MODELS") else DepthConfig())
        self.model = MetricDepth(self.config)
        if params is None:
            dummy = jnp.zeros((1, 3, self.config.image_size, self.config.image_size))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)["params"]
        self.params = jax.tree.map(jnp.asarray, params)

        import functools

        @functools.partial(jax.jit, static_argnames=())
        def _fwd(params, img):
            return self.model.apply({"params": params}, img)

        self._fwd = _fwd

    @classmethod
    def from_weights(cls, weights_path: str | None, config: DepthConfig | None = None):
        from scripts.common import load_params

        params = load_params(weights_path) if weights_path else None
        return cls(config, params=params)

    def predict(self, image: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8/float -> [H, W] metric depth (metres)."""
        h, w = image.shape[:2]
        img = jnp.asarray(image, jnp.float32)
        if image.dtype == np.uint8:
            img = img / 255.0
        chw = img.transpose(2, 0, 1)
        size = self.config.image_size
        resized = resize_bilinear(chw, (size, size))
        mean = jnp.asarray(self.IMAGE_MEAN).reshape(3, 1, 1)
        std = jnp.asarray(self.IMAGE_STD).reshape(3, 1, 1)
        depth = self._fwd(self.params, ((resized - mean) / std)[None])[0]
        return np.asarray(resize_bilinear(depth, (h, w)))
