"""ZoeDepth metric monocular depth (BEiT trunk + DPT neck + metric-bins head).

TPU-native counterpart of the ZoeD_N model the reference pulls from torch.hub
for metric scale correction and depth_pred precomputation (reference
scripts/compute_scale_video.py:40, scripts/generate_depth_zoe.py:14-31).
Checkpoint-parity with the released weights (HF Intel/zoedepth-nyu layout;
converter freepose_tpu.models.convert.zoedepth_from_hf):

  * BEiT-L/16 backbone (freepose_tpu.models.beit) tapped at 4 depths;
  * DPT reassemble (cls-readout project, per-stage resize) + fusion pyramid;
  * relative-depth head, then the ZoeDepth metric-bins head: seed bin
    regressor -> 4 attractor refinements over the fusion pyramid -> a
    conditional log-binomial softmax over bin centers; depth = Σ p·c.

Faithful quirks kept for weight compatibility: the attractor uses the
inv-attractor DEFAULT strengths (alpha=300, gamma=2) regardless of config —
the torch code never forwards its configured values — and softplus
("unnormed") bin centers, matching the released ZoeD_N.
All interpolations match torch align_corners semantics exactly
(resize_bilinear / resize_bilinear_ac).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.models.beit import BEIT_TEST, BeitBackbone, BeitConfig
from freepose_tpu.ops.sampling import resize_bilinear, resize_bilinear_ac


@dataclasses.dataclass(frozen=True)
class DepthConfig:
    beit: BeitConfig = BeitConfig()
    neck_hidden_sizes: tuple = (256, 512, 1024, 1024)
    reassemble_factors: tuple = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    bottleneck_features: int = 256
    num_relative_features: int = 32
    bin_embedding_dim: int = 128
    num_attractors: tuple = (16, 8, 4, 1)
    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0
    min_temp: float = 0.0212
    max_temp: float = 50.0
    bin_centers_type: str = "softplus"  # or "normed"
    attractor_kind: str = "mean"
    dtype: jnp.dtype = jnp.float32

    @property
    def image_size(self) -> int:
        return self.beit.image_size


DEPTH_TEST = DepthConfig(
    beit=BEIT_TEST,
    neck_hidden_sizes=(16, 24, 32, 40), fusion_hidden_size=32,
    bottleneck_features=32, num_relative_features=8, bin_embedding_dim=8,
    num_attractors=(4, 4, 4, 4), n_bins=64,
)


def _resize_nhwc(x: jax.Array, hw: tuple[int, int], align_corners: bool) -> jax.Array:
    """Bilinear resize of [B, H, W, C] (channels stay in lanes)."""
    moved = jnp.moveaxis(x, -1, 1)
    out = resize_bilinear_ac(moved, hw) if align_corners else resize_bilinear(moved, hw)
    return jnp.moveaxis(out, 1, -1)


def _block_upsample(x: jax.Array, w: jax.Array, b: jax.Array, k: int) -> jax.Array:
    """ConvTranspose with kernel == stride (non-overlapping): each input
    pixel expands to a k×k output block. Exact einsum equivalent of torch
    ConvTranspose2d(k, stride=k); `w` keeps the torch (in, out, k, k) layout
    so conversion is a copy."""
    bsz, h, wd, _ = x.shape
    out = jnp.einsum("bhwi,iokl->bhkwlo", x, w.astype(x.dtype))
    out = out.reshape(bsz, h * k, wd * k, w.shape[1])
    return out + b.astype(x.dtype)


class ReassembleStage(nn.Module):
    """Tokens (with cls) -> 4 image-like maps at pyramid scales (HF
    ZoeDepthReassembleStage, modeling_zoedepth.py:56-152)."""

    config: DepthConfig

    @nn.compact
    def __call__(self, taps, window):
        c = self.config
        gh, gw = window
        out = []
        for i, (tokens, ch, factor) in enumerate(
            zip(taps, c.neck_hidden_sizes, c.reassemble_factors)
        ):
            cls_tok, patch = tokens[:, :1], tokens[:, 1:]
            readout = jnp.broadcast_to(cls_tok, patch.shape)
            h = jnp.concatenate([patch, readout], axis=-1)
            h = nn.Dense(c.beit.hidden_size, dtype=c.dtype, name=f"readout{i}")(h)
            h = nn.gelu(h, approximate=False)
            h = h.reshape(h.shape[0], gh, gw, -1)
            h = nn.Conv(ch, (1, 1), dtype=c.dtype, name=f"proj{i}")(h)
            if factor > 1:
                k = int(factor)
                w = self.param(f"resize{i}_w", nn.initializers.lecun_normal(), (ch, ch, k, k))
                b = self.param(f"resize{i}_b", nn.initializers.zeros, (ch,))
                h = _block_upsample(h, w, b, k)
            elif factor < 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=c.dtype, name=f"resize{i}")(h)
            out.append(h)
        return out


class PreActResidual(nn.Module):
    dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3, 3), dtype=self.dtype, name="conv2")(h)
        return x + h


class FusionLayer(nn.Module):
    """DPT feature fusion (HF ZoeDepthFeatureFusionLayer:242-277): optional
    skip add through a residual unit, residual unit, 2x upsample
    (align_corners=True), 1x1 projection."""

    config: DepthConfig

    @nn.compact
    def __call__(self, x, residual=None):
        c = self.config
        d = c.fusion_hidden_size
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = _resize_nhwc(residual, x.shape[1:3], align_corners=False)
            x = x + PreActResidual(d, c.dtype, name="res1")(residual)
        x = PreActResidual(d, c.dtype, name="res2")(x)
        x = _resize_nhwc(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
        return nn.Conv(d, (1, 1), dtype=c.dtype, name="proj")(x)


class Projector(nn.Module):
    out_features: int
    mlp_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mlp_dim, (1, 1), dtype=self.dtype, name="conv1")(x)
        return nn.Conv(self.out_features, (1, 1), dtype=self.dtype, name="conv2")(nn.relu(h))


def _inv_attractor(dx: jax.Array) -> jax.Array:
    """dc = dx / (1 + 300·dx²) — the torch default strengths; the reference
    implementation never passes its configured alpha/gamma through."""
    return dx / (1.0 + 300.0 * dx * dx)


class AttractorLayer(nn.Module):
    """Bin-center refinement (HF ZoeDepthAttractorLayer[Unnormed]:571-747).
    Channels-last: bins/attractors live in the trailing axis."""

    config: DepthConfig
    n_attractors: int

    @nn.compact
    def __call__(self, x, prev_bin, prev_bin_embedding):
        c = self.config
        if prev_bin_embedding is not None:
            pbe = _resize_nhwc(prev_bin_embedding, x.shape[1:3], align_corners=True)
            x = x + pbe
        h = nn.Conv(c.bin_embedding_dim, (1, 1), dtype=c.dtype, name="conv1")(x)
        h = nn.relu(h)
        normed = c.bin_centers_type == "normed"
        n_out = self.n_attractors * 2 if normed else self.n_attractors
        h = nn.Conv(n_out, (1, 1), dtype=c.dtype, name="conv2")(h)

        centers = _resize_nhwc(prev_bin, x.shape[1:3], align_corners=True)
        if normed:
            att = nn.relu(h) + 1e-3
            # Upstream bug kept for weight parity: of the 2-per-attractor
            # channels only the first is used (modeling_zoedepth.py:643-647).
            att = att.reshape(*att.shape[:3], self.n_attractors, 2)[..., 0]
        else:
            att = jax.nn.softplus(h)
        delta = _inv_attractor(att[..., None, :] - centers[..., :, None])
        delta = delta.mean(-1) if c.attractor_kind == "mean" else delta.sum(-1)
        new_centers = centers + delta
        if normed:
            scaled = (c.max_depth - c.min_depth) * new_centers + c.min_depth
            scaled = jnp.clip(jnp.sort(scaled, axis=-1), c.min_depth, c.max_depth)
            return new_centers, scaled
        return new_centers, new_centers


class SeedBinRegressor(nn.Module):
    config: DepthConfig

    @nn.compact
    def __call__(self, x):
        c = self.config
        h = nn.Conv(256, (1, 1), dtype=c.dtype, name="conv1")(x)
        h = nn.Conv(c.n_bins, (1, 1), dtype=c.dtype, name="conv2")(nn.relu(h))
        if c.bin_centers_type == "normed":
            h = nn.relu(h) + 1e-3
            widths_normed = h / h.sum(-1, keepdims=True)
            widths = (c.max_depth - c.min_depth) * widths_normed
            edges = jnp.cumsum(
                jnp.pad(widths, [(0, 0)] * 3 + [(1, 0)], constant_values=c.min_depth), axis=-1
            )
            centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
            return widths_normed, centers
        h = jax.nn.softplus(h)
        return h, h


class ConditionalLogBinomial(nn.Module):
    """Per-pixel p/temperature MLP + log-binomial softmax over n_bins (HF
    ZoeDepthConditionalLogBinomialSoftmax:428-492)."""

    config: DepthConfig

    @nn.compact
    def __call__(self, main, cond):
        c = self.config
        x = jnp.concatenate([main, cond], axis=-1)
        bott = x.shape[-1] // 2
        h = nn.Conv(bott, (1, 1), dtype=c.dtype, name="mlp1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(4, (1, 1), dtype=c.dtype, name="mlp2")(h)
        h = jax.nn.softplus(h)
        pt = h + 1e-4
        p = pt[..., 0] / (pt[..., 0] + pt[..., 1])
        t = pt[..., 2] / (pt[..., 2] + pt[..., 3])
        t = (c.max_temp - c.min_temp) * t + c.min_temp

        k = c.n_bins
        k_idx = jnp.arange(k, dtype=jnp.float32)
        k_m1 = float(k - 1)
        eps = 1e-4
        p = jnp.clip(p, eps, 1.0)[..., None]
        one_m = jnp.clip(1.0 - p, eps, 1.0)

        # log C(k-1, i) with the torch eps-stirling formula
        # (modeling_zoedepth.py:382-385) evaluated as a host-side float64
        # constant: under XLA constant folding the jnp version can produce
        # 0 * log(0) = NaN at i = k-1.
        e = 1e-7
        n_np = np.float64(k_m1) + e
        r_np = np.arange(k, dtype=np.float64) + e
        lb = n_np * np.log(n_np) - r_np * np.log(r_np) - (n_np - r_np) * np.log(n_np - r_np + e)
        lb = jnp.asarray(lb, jnp.float32)

        y = lb + k_idx * jnp.log(p) + (k_m1 - k_idx) * jnp.log(one_m)
        return jax.nn.softmax(y / t[..., None], axis=-1)


class ZoeDepthModel(nn.Module):
    """Full depth net: pixels [B, 3, H, W] -> metric depth [B, H, W]."""

    config: DepthConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        c = self.config
        taps, window = BeitBackbone(c.beit, name="backbone")(pixels)

        reassembled = ReassembleStage(c, name="reassemble")(taps, window)
        feats = [
            nn.Conv(c.fusion_hidden_size, (3, 3), use_bias=False, dtype=c.dtype,
                    name=f"neck_conv{i}")(f)
            for i, f in enumerate(reassembled)
        ]
        bottleneck = feats[-1]

        # Fusion: deepest-first (HF ZoeDepthFeatureFusionStage:154-176).
        fused = []
        state = None
        for i, f in enumerate(feats[::-1]):
            layer = FusionLayer(c, name=f"fusion{i}")
            state = layer(f) if state is None else layer(state, f)
            fused.append(state)

        # Relative head on the last (highest-res) fused map
        # (HF ZoeDepthRelativeDepthEstimationHead:333-381).
        h = nn.Conv(c.fusion_hidden_size // 2, (3, 3), dtype=c.dtype, name="rel_conv1")(fused[-1])
        h = _resize_nhwc(h, (h.shape[1] * 2, h.shape[2] * 2), align_corners=True)
        h = nn.Conv(c.num_relative_features, (3, 3), dtype=c.dtype, name="rel_conv2")(h)
        rel_features = nn.relu(h)
        rel_depth = nn.relu(
            nn.Conv(1, (1, 1), dtype=c.dtype, name="rel_conv3")(rel_features)
        )[..., 0]

        # Metric-bins head (HF ZoeDepthMetricDepthEstimationHead:1107-1203).
        x = nn.Conv(c.bottleneck_features, (1, 1), dtype=c.dtype, name="mh_conv2")(bottleneck)
        _, seed_centers = SeedBinRegressor(c, name="seed_bin")(x)
        if c.bin_centers_type == "normed":
            prev_bin = (seed_centers - c.min_depth) / (c.max_depth - c.min_depth)
        else:
            prev_bin = seed_centers
        prev_emb = Projector(c.bin_embedding_dim, dtype=c.dtype, name="seed_proj")(x)

        centers = None
        emb = None
        for i, feat in enumerate(fused):
            emb = Projector(c.bin_embedding_dim, dtype=c.dtype, name=f"mh_proj{i}")(feat)
            prev_bin, centers = AttractorLayer(c, c.num_attractors[i], name=f"attractor{i}")(
                emb, prev_bin, prev_emb
            )
            prev_emb = emb

        rel_cond = _resize_nhwc(rel_depth[..., None], rel_features.shape[1:3], align_corners=True)
        last = jnp.concatenate([rel_features, rel_cond], axis=-1)
        emb = _resize_nhwc(emb, last.shape[1:3], align_corners=True)
        probs = ConditionalLogBinomial(c, name="clb")(last, emb)
        centers = _resize_nhwc(centers, probs.shape[1:3], align_corners=True)
        return jnp.sum(probs * centers, axis=-1)


class MetricDepthEstimator:
    """Prediction front end (torch.hub ZoeD_N equivalent)."""

    IMAGE_MEAN = (0.485, 0.456, 0.406)
    IMAGE_STD = (0.229, 0.224, 0.225)

    def __init__(self, config: DepthConfig | None = None, params=None, seed: int = 0):
        import os

        if config is None:
            config = DEPTH_TEST if os.environ.get("FREEPOSE_TINY_MODELS") else DepthConfig()
            if config is not DEPTH_TEST and jax.devices()[0].platform in ("tpu", "axon"):
                import dataclasses

                # Biased flash attention in the BEiT trunk: 480p forward
                # 213.7 -> 174.7 ms on one v5e (the dense path materializes
                # the [16, 1201, 1201] fp32 logit+bias tensors per layer).
                config = dataclasses.replace(
                    config, beit=dataclasses.replace(config.beit, use_flash=True)
                )
        self.config = config
        self.model = ZoeDepthModel(self.config)
        if params is None:
            dummy = jnp.zeros((1, 3, self.config.image_size, self.config.image_size))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)["params"]
        self.params = jax.tree.map(jnp.asarray, params)

        @jax.jit
        def _fwd(params, img):
            return self.model.apply({"params": params}, img)

        self._fwd = _fwd

    @classmethod
    def from_weights(cls, weights_path: str | None, config: DepthConfig | None = None):
        from scripts.common import load_params

        params = load_params(weights_path) if weights_path else None
        return cls(config, params=params)

    def predict(self, image: np.ndarray, input_hw: tuple[int, int] | None = None) -> np.ndarray:
        """[H, W, 3] uint8/float -> [H, W] metric depth (metres).

        input_hw overrides the model resolution (each side must be a multiple
        of the BEiT patch size; ZoeD_N production runs 384x512 — the rel-pos
        tables interpolate to the non-pretrain window)."""
        h, w = image.shape[:2]
        img = jnp.asarray(image, jnp.float32)
        if image.dtype == np.uint8:
            img = img / 255.0
        chw = img.transpose(2, 0, 1)
        size = self.config.image_size
        ih, iw = input_hw or (size, size)
        patch = self.config.beit.patch_size
        if ih % patch or iw % patch:
            raise ValueError(f"input_hw must be multiples of {patch}, got {(ih, iw)}")
        resized = resize_bilinear(chw, (ih, iw))
        mean = jnp.asarray(self.IMAGE_MEAN).reshape(3, 1, 1)
        std = jnp.asarray(self.IMAGE_STD).reshape(3, 1, 1)
        depth = self._fwd(self.params, ((resized - mean) / std)[None])[0]
        return np.asarray(resize_bilinear(depth, (h, w)))
