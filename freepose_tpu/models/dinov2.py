"""DINOv2 ViT with register tokens, in Flax.

TPU-native re-implementation of the two DINOv2 towers the reference drives
through torch.hub: ViT-L/14-reg for retrieval / pose scoring (reference
src/pipeline/retrieval/dino.py:7-32, truncated at block 22 of 24) and
ViT-B/14-reg for tracking-refiner confidence (reference
src/pipeline/estimators/tracking_refiner.py:23-28, 518² → 37×37 patches).

Layout: tokens = [cls, reg×4, patches]; position embeddings cover cls+patches
only (registers get none), bicubically resampled for non-native grids.
Weights convert from HF `Dinov2WithRegistersModel` checkpoints via
freepose_tpu.models.convert.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from freepose_tpu.models.vit import TransformerBlock, interpolate_pos_embed

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 518  # native grid the position embeddings were trained at
    num_registers: int = 4
    mlp_ratio: float = 4.0
    use_flash: bool = False  # Pallas flash-attention kernel (TPU)
    dtype: jnp.dtype = jnp.float32

    @property
    def native_grid(self) -> int:
        return self.image_size // self.patch_size


VIT_L14_REG = DinoV2Config()
VIT_B14_REG = DinoV2Config(hidden_size=768, num_layers=12, num_heads=12)
VIT_S14_REG = DinoV2Config(hidden_size=384, num_layers=12, num_heads=6)
# Tiny config for tests.
VIT_TEST = DinoV2Config(hidden_size=64, num_layers=3, num_heads=4, image_size=56)


class _ScanBlock(nn.Module):
    """One transformer block inside an nn.scan roll: advances the residual
    stream and (with capture=True) snapshots it at the requested truncation
    layer. Rolling the depth keeps the compiled graph one block long (compile
    time ~L× smaller). capture=False is the fast path used when the scan
    length already EQUALS the truncation layer (params pre-sliced — the
    production _extract_jit route): the final carry IS the requested output,
    and the per-step jnp.where snapshot would copy the full [B, N, D]
    activation twice per layer for nothing (profiled at ~10% of the ViT-L
    featurize step). Both variants build the identical "block" param tree."""

    config: DinoV2Config
    capture: bool = True

    @nn.compact
    def __call__(self, carry, _):
        if self.capture:
            x, captured, idx, target = carry
        else:
            x = carry
        cfg = self.config
        attention_fn = None
        if cfg.use_flash:
            from freepose_tpu.ops.attention import flash_attention_fn

            attention_fn = flash_attention_fn
        x = TransformerBlock(
            cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio, layerscale=True,
            dtype=cfg.dtype, attention_fn=attention_fn, name="block",
        )(x)
        if not self.capture:
            return x, None
        captured = jnp.where(idx + 1 == target, x, captured)
        return (x, captured, idx + 1, target), None


class DinoV2(nn.Module):
    """Returns all-token features after block `layer` + final norm."""

    config: DinoV2Config

    @nn.compact
    def __call__(self, images: jax.Array, layer: Optional[int] = None) -> jax.Array:
        """images: [B, 3, H, W], ImageNet-normalized. -> [B, 1+R+N, D]."""
        cfg = self.config
        n_layers = layer if layer is not None else cfg.num_layers
        b, _, h, w = images.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size

        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=cfg.dtype,
            name="patch_embed",
        )(images.transpose(0, 2, 3, 1))
        x = x.reshape(b, gh * gw, cfg.hidden_size)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size))
        reg_tokens = self.param(
            "reg_tokens", nn.initializers.zeros, (1, cfg.num_registers, cfg.hidden_size)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + cfg.native_grid**2, cfg.hidden_size),
        )

        # cls + patches get position embeddings; registers are inserted after.
        patch_pos = interpolate_pos_embed(pos_embed[:, 1:], (gh, gw), cfg.native_grid)
        x = x + patch_pos.astype(cfg.dtype)
        cls = (cls_token + pos_embed[:, :1]).astype(cfg.dtype)
        tokens = jnp.concatenate(
            [
                jnp.tile(cls, (b, 1, 1)),
                jnp.tile(reg_tokens.astype(cfg.dtype), (b, 1, 1)),
                x,
            ],
            axis=1,
        )

        if n_layers == cfg.num_layers:
            # Scan length == requested layer (params pre-sliced): final carry
            # is the output — no per-step snapshot copies.
            scanned = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.num_layers,
            )(cfg, capture=False, name="blocks")
            captured, _ = scanned(tokens, None)
        else:
            scanned = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.num_layers,
            )(cfg, name="blocks")
            carry0 = (tokens, tokens, jnp.int32(0), jnp.asarray(n_layers, jnp.int32))
            (_, captured, _, _), _ = scanned(carry0, None)
        return nn.LayerNorm(epsilon=1e-6, dtype=cfg.dtype, name="norm")(captured)


def normalize_images(images: jax.Array) -> jax.Array:
    """[B, 3, H, W] in [0, 1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, images.dtype).reshape(1, 3, 1, 1)
    return (images - mean) / std


def split_tokens(tokens: jax.Array, num_registers: int = 4) -> dict:
    return {
        "cls": tokens[:, 0],
        "reg": tokens[:, 1 : 1 + num_registers],
        "patch": tokens[:, 1 + num_registers :],
    }


class DinoFeatureExtractor:
    """Feature-extraction front end mirroring the reference's extractor API
    (src/pipeline/retrieval/dino.py:14-32): normalize, run to `layer`, final
    norm, select cls / reg / patch tokens. The forward is one jit program per
    (shape, layer)."""

    def __init__(self, config: DinoV2Config = VIT_L14_REG, params=None, seed: int = 0):
        self.config = config
        self.model = DinoV2(config)
        if params is None:
            dummy = jnp.zeros((1, 3, config.patch_size * 2, config.patch_size * 2), config.dtype)
            params = self.model.init(jax.random.PRNGKey(seed), dummy)["params"]
        self.params = jax.tree.map(jnp.asarray, params)
        self._params_cache: dict = {}

    def __call__(self, images: jax.Array, layer: int = 22, feature_type: str = "patch") -> jax.Array:
        return _extract_jit(self, self.params_for(layer), images, layer, feature_type)

    def params_for(self, layer: int | None = None):
        """Sliced-to-`layer`, dtype-pre-cast param tree (cached per layer).

        The in-graph slice of the [24, ...] stacked block params to
        [layer, ...] PLUS their f32 -> compute-dtype conversion costs ~2-3 ms
        of device time on EVERY dispatch at ViT-L scale (profiled); both are
        pure functions of (params, layer, dtype), so they run once here and
        the fused pipeline programs receive the ready tree. Casting matches
        what flax does in-graph (modules promote params to `dtype` at use),
        so numerics are identical; cls/reg/pos tokens stay f32 because the
        model does THEIR f32 math (pos interpolation, cls+pos add) before
        its explicit .astype."""
        cache = self._params_cache
        key = layer
        if key not in cache:
            cfg = self.config
            params = self.params
            if layer is not None and layer < cfg.num_layers:
                params = dict(params)
                params["blocks"] = jax.tree.map(lambda a: a[:layer], params["blocks"])
            if cfg.dtype != jnp.float32:
                params = dict(params)
                for sub in ("blocks", "norm", "patch_embed"):
                    if sub in params:
                        params[sub] = jax.tree.map(
                            lambda a: jnp.asarray(a, cfg.dtype), params[sub]
                        )
            cache[key] = params
        return cache[key]

    def extract_sharded(self, images: jax.Array, layer: int = 22,
                        feature_type: str = "patch", mesh=None) -> jax.Array:
        """Data-parallel extraction: the batch axis shards across the mesh's
        'data' axis (params replicated), XLA inserting the gather on return.
        The TPU-native replacement for the reference's per-GPU SLURM fan-out
        of feature extraction (SURVEY §2.7); pads the batch to the shard
        count so uneven batches still compile with static shapes."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if mesh is None:
            from freepose_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(data=len(jax.devices()), model=1)
        n_data = mesh.shape["data"]
        n = images.shape[0]
        pad = (-n) % n_data
        if pad:
            images = jnp.concatenate([images, jnp.zeros((pad,) + images.shape[1:], images.dtype)])
        images = jax.device_put(images, NamedSharding(mesh, P("data")))
        params = jax.device_put(self.params, NamedSharding(mesh, P()))

        @partial(jax.jit, static_argnames=("extractor", "layer", "feature_type"),
                 out_shardings=NamedSharding(mesh, P("data")))
        def _fwd(extractor, params, images, layer, feature_type):
            return _extract_jit.__wrapped__(extractor, params, images, layer, feature_type)

        out = _fwd(self, params, images, layer, feature_type)
        return out[:n]

    def __hash__(self):  # jit static self
        return id(self)

    def __eq__(self, other):
        return self is other


@partial(jax.jit, static_argnames=("extractor", "layer", "feature_type"))
def _extract_jit(extractor, params, images, layer, feature_type):
    """Params enter as an ARGUMENT: closing over them via a static `self`
    would embed ~1.2 GB of weights as compile-time constants — which both
    bloats the executable and exceeds remote-compile request limits
    (observed HTTP 413).

    `layer` is static here, so truncation really skips compute: the stacked
    scan params are sliced to the first `layer` blocks and the scan length
    shrinks to match (running all 24 blocks and snapshotting the carry costs
    the full depth — measured identical times for layer 4 vs 24)."""
    import dataclasses

    cfg = extractor.config
    stored_depth = jax.tree.leaves(params["blocks"])[0].shape[0]
    if layer is not None and layer < cfg.num_layers:
        if stored_depth != layer:  # not pre-sliced by params_for
            params = dict(params)
            params["blocks"] = jax.tree.map(lambda a: a[:layer], params["blocks"])
        model = DinoV2(dataclasses.replace(cfg, num_layers=layer))
    else:
        model = extractor.model
    tokens = model.apply(
        {"params": params}, normalize_images(images.astype(cfg.dtype))
    )
    return split_tokens(tokens, cfg.num_registers)[feature_type]
