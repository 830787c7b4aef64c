"""CLIP image + text towers in Flax.

TPU-native re-implementation of the CLIP ViT-bigG-14 extractor the reference
drives through open_clip (src/pipeline/retrieval/clip.py:7-18) for metric
scale estimation: image embeddings for proposals and text embeddings for the
2,201 LLM scale-prior object names (scale_estimators.py:82-102).

Architecture follows the CLIP family (pre-LN ViT with class token + learned
positions; causal text transformer pooled at EOT), parameterised so both
OpenAI/HF checkpoints and open_clip bigG checkpoints convert onto it (see
freepose_tpu.models.convert.clip_from_hf).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    # vision
    image_size: int = 224
    patch_size: int = 14
    vision_width: int = 1664
    vision_layers: int = 48
    vision_heads: int = 16
    # text
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 1280
    text_layers: int = 32
    text_heads: int = 20
    # joint
    embed_dim: int = 1280
    mlp_ratio: float = 4.0
    quick_gelu: bool = False  # bigG uses plain GELU; OpenAI ViT-L uses quick
    dtype: jnp.dtype = jnp.float32


VIT_BIGG_14 = ClipConfig()
CLIP_TEST = ClipConfig(
    image_size=28, patch_size=14, vision_width=32, vision_layers=2, vision_heads=2,
    vocab_size=64, context_length=12, text_width=24, text_layers=2, text_heads=2,
    embed_dim=16,
)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ClipEncoderLayer(nn.Module):
    width: int
    heads: int
    mlp_ratio: float
    quick_gelu: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        b, n, _ = x.shape
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln1")(x)
        head_dim = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(b, n, 3, self.heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        logits = logits * (head_dim**-0.5)
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhnm,bhmd->bhnd", w, v).transpose(0, 2, 1, 3).reshape(b, n, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="proj")(attn)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(int(self.width * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = _quick_gelu(h) if self.quick_gelu else nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)
        return x + h


class _ScanVisionLayer(nn.Module):
    """Rolled encoder layer (nn.scan) — one compiled block instead of an
    L-deep unrolled graph (bigG has 48 vision / 32 text layers)."""

    config: ClipConfig

    @nn.compact
    def __call__(self, x, _):
        c = self.config
        x = ClipEncoderLayer(
            c.vision_width, c.vision_heads, c.mlp_ratio, c.quick_gelu, c.dtype, name="layer"
        )(x)
        return x, None


class _ScanTextLayer(nn.Module):
    config: ClipConfig

    @nn.compact
    def __call__(self, carry, _):
        x, mask = carry
        c = self.config
        x = ClipEncoderLayer(
            c.text_width, c.text_heads, c.mlp_ratio, c.quick_gelu, c.dtype, name="layer"
        )(x, mask=mask)
        return (x, mask), None


class ClipVisionTower(nn.Module):
    config: ClipConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """[B, 3, H, W] CLIP-normalized -> [B, embed_dim] image features."""
        cfg = self.config
        b = images.shape[0]
        x = nn.Conv(
            cfg.vision_width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=cfg.dtype,
            name="patch_embed",
        )(images.transpose(0, 2, 3, 1))
        x = x.reshape(b, -1, cfg.vision_width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.vision_width,))
        x = jnp.concatenate([jnp.tile(cls[None, None], (b, 1, 1)).astype(cfg.dtype), x], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (n_pos, cfg.vision_width))
        x = x + pos[None].astype(cfg.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_pre")(x)
        scanned = nn.scan(
            _ScanVisionLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.vision_layers,
        )(cfg, name="layers")
        x, _ = scanned(x, None)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (cfg.vision_width, cfg.embed_dim)
        )
        return pooled @ proj.astype(cfg.dtype)


class ClipTextTower(nn.Module):
    config: ClipConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, eot_positions: jax.Array | None = None) -> jax.Array:
        """[B, L] token ids -> [B, embed_dim] text features (pooled at EOT).

        `eot_positions`: index of the EOT token per row; defaults to argmax of
        ids (CLIP's EOT has the highest vocab id, open_clip convention)."""
        cfg = self.config
        b, length = input_ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.text_width)
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.01), (cfg.context_length, cfg.text_width)
        )
        x = tok[input_ids].astype(cfg.dtype) + pos[None, :length].astype(cfg.dtype)
        causal = jnp.triu(jnp.full((length, length), -jnp.inf, jnp.float32), k=1)
        scanned = nn.scan(
            _ScanTextLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.text_layers,
        )(cfg, name="layers")
        (x, _), _ = scanned((x, causal[None, None]), None)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="ln_final")(x)
        if eot_positions is None:
            eot_positions = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eot_positions]
        proj = self.param("text_proj", nn.initializers.normal(0.02), (cfg.text_width, cfg.embed_dim))
        return pooled @ proj.astype(cfg.dtype)


class Clip(nn.Module):
    config: ClipConfig

    def setup(self):
        self.visual = ClipVisionTower(self.config)
        self.text = ClipTextTower(self.config)

    def encode_image(self, images: jax.Array) -> jax.Array:
        return self.visual(images)

    def encode_text(self, input_ids: jax.Array, eot_positions=None) -> jax.Array:
        return self.text(input_ids, eot_positions)

    def __call__(self, images: jax.Array, input_ids: jax.Array):
        img = self.encode_image(images)
        txt = self.encode_text(input_ids)
        return img, txt


def clip_normalize_images(images: jax.Array) -> jax.Array:
    """[B, 3, H, W] in [0, 1] -> CLIP-normalized (reference clip.py:12)."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype).reshape(1, 3, 1, 1)
    return (images - mean) / std


class ClipFeatureExtractor:
    """Image/text embedding front end (reference clip.py:7-18)."""

    def __init__(self, config: ClipConfig = VIT_BIGG_14, params=None, seed: int = 0):
        self.config = config
        self.model = Clip(config)
        if params is None:
            dummy_img = jnp.zeros((1, 3, config.image_size, config.image_size), config.dtype)
            dummy_txt = jnp.zeros((1, config.context_length), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(seed), dummy_img, dummy_txt)["params"]
        self.params = jax.tree.map(jnp.asarray, params)

    def encode_image(self, images: jax.Array) -> jax.Array:
        return _encode_image_jit(self, self.params, images)

    def encode_text(self, input_ids: jax.Array) -> jax.Array:
        return _encode_text_jit(self, self.params, input_ids)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@partial(jax.jit, static_argnames=("extractor",))
def _encode_image_jit(extractor, params, images):
    """Params as an argument, never closed over via static self (a closure
    embeds the bigG weights as compile-time constants; see dinov2.py)."""
    return extractor.model.apply(
        {"params": params},
        clip_normalize_images(images.astype(extractor.config.dtype)),
        method=Clip.encode_image,
    )


@partial(jax.jit, static_argnames=("extractor",))
def _encode_text_jit(extractor, params, input_ids):
    return extractor.model.apply({"params": params}, input_ids, method=Clip.encode_text)
