"""GroundingDINO open-vocabulary detector in Flax.

TPU-native re-implementation of the detector the reference drives through HF
transformers with the prompt "objects." (reference
scripts/extract_proposals_ground.py:48-75): Swin backbone + BERT text tower,
6 encoder layers of (vision↔text bi-attention fusion, text self-enhancement,
multi-scale deformable vision attention), language-guided two-stage query
selection (top num_queries proposals by max text logit), and a 6-layer
decoder with iterative box refinement and contrastive (vision·text) class
logits.

TPU notes: multi-scale deformable attention is a batched bilinear gather —
implemented with static per-level loops and `bilinear_sample`-style gathers
(no torch grid_sample); everything assumes an un-padded pixel mask (the
pipeline feeds single resized images), so valid_ratios == 1.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.models.bert import Bert, BertConfig
from freepose_tpu.models.swin import SWIN_B, SwinBackbone, SwinConfig

# BERT ids of [CLS], [SEP], '.', '?' — sub-sentence delimiters.
SPECIAL_TOKENS = (101, 102, 1012, 1029)


@dataclasses.dataclass(frozen=True)
class GroundingDinoConfig:
    # Default = grounding-dino-BASE (the checkpoint the reference loads,
    # extract_proposals_ground.py:48): Swin-B backbone + BERT-base text.
    swin: SwinConfig = SWIN_B
    text: BertConfig = BertConfig()
    d_model: int = 256
    num_feature_levels: int = 4
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_heads: int = 8
    decoder_heads: int = 8
    encoder_ffn: int = 2048
    decoder_ffn: int = 2048
    encoder_points: int = 4
    decoder_points: int = 4
    num_queries: int = 900
    max_text_len: int = 256
    pos_temperature: float = 20.0
    dtype: jnp.dtype = jnp.float32


GDINO_TEST = GroundingDinoConfig(
    swin=SwinConfig(embed_dim=8, depths=(1, 1, 2), num_heads=(1, 2, 4), window_size=4, out_stages=(1, 2)),
    text=BertConfig(vocab_size=120, hidden_size=24, num_layers=1, num_heads=2, intermediate=48, max_position=32),
    d_model=32, num_feature_levels=3, encoder_layers=1, decoder_layers=2,
    encoder_heads=4, decoder_heads=4, encoder_ffn=64, decoder_ffn=64,
    num_queries=12, max_text_len=16,
)


# --------------------------------------------------------------------------- #
def text_token_masks(input_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sub-sentence self-attention masks + position ids from special tokens
    (HF generate_masks_with_special_tokens_and_transfer_map)."""
    b, n = input_ids.shape
    special = np.isin(input_ids, SPECIAL_TOKENS)
    attn = np.tile(np.eye(n, dtype=bool)[None], (b, 1, 1))
    pos = np.zeros((b, n), np.int64)
    for row in range(b):
        prev = 0
        for col in np.nonzero(special[row])[0]:
            if col == 0 or col == n - 1:
                attn[row, col, col] = True
                pos[row, col] = 0
            else:
                attn[row, prev + 1 : col + 1, prev + 1 : col + 1] = True
                pos[row, prev + 1 : col + 1] = np.arange(0, col - prev)
            prev = col
    return attn, pos


def sine_pos_2d(h: int, w: int, dim: int, temperature: float, scale: float = 2 * math.pi) -> jnp.ndarray:
    """[h, w, dim] image sine embedding (HF GroundingDinoSinePositionEmbedding
    with an all-ones mask)."""
    half = dim // 2
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + 1e-6) * scale
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + 1e-6) * scale
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    px = x[None, :, None] / dim_t
    py = y[:, None, None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], -1).reshape(1, w, half)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], -1).reshape(h, 1, half)
    px = jnp.tile(px, (h, 1, 1))
    py = jnp.tile(py, (1, w, 1))
    return jnp.concatenate([py, px], axis=-1)


def sine_pos_1d(values: jax.Array, dim: int, temperature: float = 10000.0) -> jax.Array:
    """[...,] scalar positions -> [..., dim] (HF get_sine_pos_embed per coord:
    interleaved sin/cos of x*2π/dim_t)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / dim)
    s = values[..., None] * scale / dim_t
    return jnp.stack([jnp.sin(s[..., 0::2]), jnp.cos(s[..., 1::2])], -1).reshape(*values.shape, dim)


def box_sine_embed(ref_points: jax.Array, d_model: int) -> jax.Array:
    """[..., 4] cxcywh -> [..., 2*d_model] with (y, x) order for the first
    two coords (HF get_sine_pos_embed exchange_xy=True), then w, h."""
    half = d_model // 2
    parts = [sine_pos_1d(ref_points[..., i], half) for i in range(ref_points.shape[-1])]
    parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


def grid_sample_zeros(value: jax.Array, locs: jax.Array) -> jax.Array:
    """torch.grid_sample(bilinear, zeros, align_corners=False) equivalent.
    value: [B, H, W, C]; locs: [B, N, 2] normalized to [-1, 1]. -> [B, N, C]."""
    b, h, w, c = value.shape
    x = (locs[..., 0] + 1.0) * w / 2.0 - 0.5
    y = (locs[..., 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yy = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xx = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(
            value.reshape(b, h * w, c), (yy * w + xx)[..., None], axis=1
        )
        return vals * valid[..., None]

    return (
        tap(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
        + tap(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
        + tap(y0 + 1, x0) * (wy * (1 - wx))[..., None]
        + tap(y0 + 1, x0 + 1) * (wy * wx)[..., None]
    )


def grid_sample_zeros_quad(value: jax.Array, locs: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    """`grid_sample_zeros` with ONE gather per sample instead of four.

    The four bilinear taps of a sample are 2×2-adjacent pixels; gathering
    them separately issues 4× the gather ops at 1/4 lane utilization (rows
    are head_dim=32 channels — 64 B in bf16, far under the 128-lane vector
    width). Here the map is re-laid-out once per level as a "quad" tensor
    whose row (i, j) concatenates pixels (i-1..i, j-1..j) — 4·C channels —
    so each sample is a single full-width row gather; the zero border of the
    padded layout reproduces torch grid_sample's zeros padding exactly, and
    the bilinear weights contract the gathered [4, C] block afterwards.
    This is the deformable-attention hot path: the encoder's sampling is
    ~91% of GroundingDINO detect device time (reference deformable
    multi-scale attention, transformers GroundingDinoMultiscaleDeformable-
    Attention; SURVEY.md §2.2 extract_proposals_ground)."""
    b, h, w, c = value.shape
    x = (locs[..., 0] + 1.0) * w / 2.0 - 0.5
    y = (locs[..., 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    p = jnp.pad(value, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [p[:, :-1, :-1], p[:, :-1, 1:], p[:, 1:, :-1], p[:, 1:, 1:]], axis=-1
    )  # [B, h+1, w+1, 4C]; row (i, j) = taps (i-1, j-1) .. (i, j)

    yi = y0 + 1.0
    xi = x0 + 1.0
    inb = (yi >= 0) & (yi <= h) & (xi >= 0) & (xi <= w)
    yi = jnp.clip(yi, 0, h).astype(jnp.int32)
    xi = jnp.clip(xi, 0, w).astype(jnp.int32)
    rows = jnp.take_along_axis(
        quad.reshape(b, (h + 1) * (w + 1), 4 * c), (yi * (w + 1) + xi)[..., None], axis=1
    )
    rows = rows.reshape(*rows.shape[:-1], 4, c)
    w4 = jnp.stack(
        [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx], axis=-1
    ) * inb[..., None]
    if weight is not None:
        # Fold a per-sample scalar (e.g. the deformable attention weight)
        # into the bilinear contraction: callers can then ACCUMULATE level
        # outputs instead of stacking [B, H, Q, L, P, dh] and paying its
        # layout-transpose copies (~10 ms/detect at grounding-dino-base).
        w4 = w4 * weight[..., None]
    return jnp.sum(rows * w4[..., None], axis=-2)


class MultiScaleDeformableAttention(nn.Module):
    """Deformable attention over flattened multi-level feature maps."""

    d_model: int
    num_heads: int
    num_points: int
    num_levels: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, queries, value_states, reference_points, spatial_shapes):
        """queries [B, Q, D] (pos already added); value_states [B, S, D];
        reference_points [B, Q, L, 2 or 4] normalized; spatial_shapes: static
        list of (h, w)."""
        c = self.d_model
        nh, npts, nl = self.num_heads, self.num_points, self.num_levels
        b, q, _ = queries.shape
        head_dim = c // nh

        value = nn.Dense(c, dtype=self.dtype, name="value_proj")(value_states)
        value = value.reshape(b, -1, nh, head_dim)
        offsets = nn.Dense(nh * nl * npts * 2, dtype=self.dtype, name="sampling_offsets")(queries)
        offsets = offsets.reshape(b, q, nh, nl, npts, 2)
        weights = nn.Dense(nh * nl * npts, dtype=self.dtype, name="attention_weights")(queries)
        weights = jax.nn.softmax(weights.reshape(b, q, nh, nl * npts), axis=-1)
        weights = weights.reshape(b, q, nh, nl, npts)

        if reference_points.shape[-1] == 2:
            norm = jnp.asarray([[wd, ht] for ht, wd in spatial_shapes], jnp.float32)  # [L, 2] (w, h)
            locs = reference_points[:, :, None, :, None, :] + offsets / norm[None, None, None, :, None, :]
        else:
            locs = (
                reference_points[:, :, None, :, None, :2]
                + offsets / npts * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        grids = 2.0 * locs - 1.0  # [B, Q, H, L, P, 2]

        # Per-level weighted sampling with the attention weight folded into
        # the bilinear contraction, ACCUMULATED across levels — no stacked
        # [B, H, Q, L, P, dh] tensor, no layout-transpose copies (same sum,
        # reassociated).
        start = 0
        out = None
        for lvl, (ht, wd) in enumerate(spatial_shapes):
            v = value[:, start : start + ht * wd]  # [B, hw, H, dh]
            v = v.transpose(0, 2, 1, 3).reshape(b * nh, ht, wd, head_dim)
            g = grids[:, :, :, lvl].transpose(0, 2, 1, 3, 4).reshape(b * nh, q * npts, 2)
            aw = weights[:, :, :, lvl].transpose(0, 2, 1, 3).reshape(b * nh, q * npts)
            s = grid_sample_zeros_quad(v, g, weight=aw)
            s = s.reshape(b, nh, q, npts, head_dim).sum(axis=3)  # [B, H, Q, dh]
            out = s if out is None else out + s
            start += ht * wd
        out = out.transpose(0, 2, 1, 3).reshape(b, q, c)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)


class MHA(nn.Module):
    """Plain multi-head attention (HF GroundingDinoMultiheadAttention)."""

    d_model: int
    num_heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, queries, keys, values, mask=None):
        b, q, _ = queries.shape
        head_dim = self.d_model // self.num_heads

        def proj(x, name):
            return nn.Dense(self.d_model, dtype=self.dtype, name=name)(x).reshape(
                b, -1, self.num_heads, head_dim
            ).transpose(0, 2, 1, 3)

        qh, kh, vh = proj(queries, "q"), proj(keys, "k"), proj(values, "v")
        logits = jnp.einsum("bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32)
        logits = logits * (head_dim**-0.5)
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", w, vh).transpose(0, 2, 1, 3).reshape(b, q, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out")(out)


class BiMultiHeadAttention(nn.Module):
    """Bidirectional vision↔text cross attention (fusion)."""

    d_model: int
    embed_dim: int
    num_heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, vision, text, text_mask=None):
        b, nv, _ = vision.shape
        nt = text.shape[1]
        head_dim = self.embed_dim // self.num_heads
        scale = head_dim**-0.5

        def proj(x, name):
            return nn.Dense(self.embed_dim, dtype=self.dtype, name=name)(x).reshape(
                b, -1, self.num_heads, head_dim
            ).transpose(0, 2, 1, 3)

        vq = proj(vision, "vision_proj") * scale
        tk = proj(text, "text_proj")
        vv = proj(vision, "values_vision_proj")
        tv = proj(text, "values_text_proj")

        logits = jnp.einsum("bhnd,bhmd->bhnm", vq, tk, preferred_element_type=jnp.float32)
        logits = logits - jnp.max(logits)
        logits = jnp.clip(logits, -50000, 50000)
        t_logits = logits.transpose(0, 1, 3, 2)
        t_logits = t_logits - jnp.max(t_logits, axis=-1, keepdims=True)
        t_logits = jnp.clip(t_logits, -50000, 50000)

        if text_mask is not None:  # [B, T] True = padding
            logits = jnp.where(text_mask[:, None, None, :], -jnp.inf, logits)
        v_attn = jax.nn.softmax(logits, axis=-1)
        t_attn = jax.nn.softmax(t_logits, axis=-1)

        v_out = jnp.einsum("bhnm,bhmd->bhnd", v_attn.astype(tv.dtype), tv)
        t_out = jnp.einsum("bhnm,bhmd->bhnd", t_attn.astype(vv.dtype), vv)
        v_out = v_out.transpose(0, 2, 1, 3).reshape(b, nv, self.embed_dim)
        t_out = t_out.transpose(0, 2, 1, 3).reshape(b, nt, self.embed_dim)
        return (
            nn.Dense(self.d_model, dtype=self.dtype, name="out_vision_proj")(v_out),
            nn.Dense(self.d_model, dtype=self.dtype, name="out_text_proj")(t_out),
        )


class EncoderLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, vision_pos, text_pos_ids, text_sa_mask, text_pad_mask,
                 reference_points, spatial_shapes):
        c = self.cfg
        # Fusion (pre-LN, layer-scaled residuals).
        v_n = nn.LayerNorm(dtype=c.dtype, name="fusion_ln_v")(vision)
        t_n = nn.LayerNorm(dtype=c.dtype, name="fusion_ln_t")(text)
        dv, dt = BiMultiHeadAttention(
            c.d_model, c.encoder_ffn // 2, c.encoder_heads // 2, c.dtype, name="fusion_attn"
        )(v_n, t_n, text_pad_mask)
        gv = self.param("fusion_vision_scale", nn.initializers.constant(1e-4), (c.d_model,))
        gt = self.param("fusion_text_scale", nn.initializers.constant(1e-4), (c.d_model,))
        vision = v_n + gv * dv
        text = t_n + gt * dt

        # Text enhancer (self attention over sub-sentences, sine pos ids).
        t_pos = sine_pos_1d(text_pos_ids.astype(jnp.float32), c.d_model)
        mask = jnp.where(text_sa_mask[:, None], 0.0, -jnp.inf)  # [B, 1, T, T]
        q = text + t_pos
        attn = MHA(c.d_model, c.encoder_heads // 2, c.dtype, name="text_attn")(q, q, text, mask)
        text = nn.LayerNorm(dtype=c.dtype, name="text_ln1")(text + attn)
        h = nn.relu(nn.Dense(c.encoder_ffn // 2, dtype=c.dtype, name="text_fc1")(text))
        h = nn.Dense(c.d_model, dtype=c.dtype, name="text_fc2")(h)
        text = nn.LayerNorm(dtype=c.dtype, name="text_ln2")(text + h)

        # Deformable vision self attention.
        dv = MultiScaleDeformableAttention(
            c.d_model, c.encoder_heads, c.encoder_points, len(spatial_shapes), c.dtype,
            name="deform_attn",
        )(vision + vision_pos, vision, reference_points, spatial_shapes)
        vision = nn.LayerNorm(dtype=c.dtype, name="deform_ln1")(vision + dv)
        h = nn.relu(nn.Dense(c.encoder_ffn, dtype=c.dtype, name="deform_fc1")(vision))
        h = nn.Dense(c.d_model, dtype=c.dtype, name="deform_fc2")(h)
        vision = nn.LayerNorm(dtype=c.dtype, name="deform_ln2")(vision + h)
        return vision, text


class DecoderLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, hidden, query_pos, reference_points_in, vision, text, text_pad_mask, spatial_shapes):
        c = self.cfg
        q = hidden + query_pos
        attn = MHA(c.d_model, c.decoder_heads, c.dtype, name="self_attn")(q, q, hidden)
        hidden = nn.LayerNorm(dtype=c.dtype, name="ln1")(hidden + attn)

        mask = jnp.where(text_pad_mask[:, None, None, :], -jnp.inf, 0.0)
        attn = MHA(c.d_model, c.decoder_heads, c.dtype, name="text_cross")(
            hidden + query_pos, text, text, mask
        )
        hidden = nn.LayerNorm(dtype=c.dtype, name="ln2")(hidden + attn)

        attn = MultiScaleDeformableAttention(
            c.d_model, c.decoder_heads, c.decoder_points, len(spatial_shapes), c.dtype,
            name="deform_cross",
        )(hidden + query_pos, vision, reference_points_in, spatial_shapes)
        hidden = nn.LayerNorm(dtype=c.dtype, name="ln3")(hidden + attn)

        h = nn.relu(nn.Dense(c.decoder_ffn, dtype=c.dtype, name="fc1")(hidden))
        h = nn.Dense(c.d_model, dtype=c.dtype, name="fc2")(h)
        return nn.LayerNorm(dtype=c.dtype, name="ln_out")(hidden + h)


class MLPHead(nn.Module):
    hidden: int
    out: int
    layers: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"layer{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, name=f"layer{self.layers - 1}")(x)


def _inv_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class GroundingDino(nn.Module):
    """Full detector: returns (logits [B, Q, max_text_len],
    pred_boxes [B, Q, 4] cxcywh in [0,1])."""

    config: GroundingDinoConfig

    @nn.compact
    def __call__(self, pixels: jax.Array, input_ids: jax.Array, text_sa_mask: jax.Array,
                 text_pos_ids: jax.Array, text_pad_mask: jax.Array):
        c = self.config
        b = pixels.shape[0]

        # ---- Text tower -------------------------------------------------- #
        text_raw = Bert(c.text, name="text_backbone")(
            input_ids, attention_mask=text_sa_mask.astype(jnp.int32),
            position_ids=text_pos_ids,
        )
        text = nn.Dense(c.d_model, dtype=c.dtype, name="text_projection")(text_raw)

        # ---- Vision tower + input projections ---------------------------- #
        stage_feats = SwinBackbone(c.swin, name="backbone")(pixels)
        feats = []
        for i, f in enumerate(stage_feats):
            h = nn.Conv(c.d_model, (1, 1), dtype=c.dtype, name=f"input_proj{i}")(f)
            h = nn.GroupNorm(num_groups=min(32, c.d_model), dtype=c.dtype, name=f"input_gn{i}")(h)
            feats.append(h)
        for i in range(len(stage_feats), c.num_feature_levels):
            src = stage_feats[-1] if i == len(stage_feats) else feats[-1]
            h = nn.Conv(c.d_model, (3, 3), strides=(2, 2), padding=1, dtype=c.dtype, name=f"input_proj{i}")(src)
            h = nn.GroupNorm(num_groups=min(32, c.d_model), dtype=c.dtype, name=f"input_gn{i}")(h)
            feats.append(h)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (c.num_feature_levels, c.d_model)
        )
        spatial_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        flat = jnp.concatenate([f.reshape(b, -1, c.d_model) for f in feats], axis=1)
        pos = jnp.concatenate([
            jnp.tile(
                (sine_pos_2d(h_, w_, c.d_model, c.pos_temperature).reshape(1, -1, c.d_model)
                 + level_embed[i][None, None]).astype(c.dtype),
                (b, 1, 1),
            )
            for i, (h_, w_) in enumerate(spatial_shapes)
        ], axis=1)

        # Encoder reference points: normalized pixel centres per level,
        # replicated across levels (valid_ratios == 1).
        refs = []
        for h_, w_ in spatial_shapes:
            yy, xx = jnp.meshgrid(
                (jnp.arange(h_, dtype=jnp.float32) + 0.5) / h_,
                (jnp.arange(w_, dtype=jnp.float32) + 0.5) / w_,
                indexing="ij",
            )
            refs.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1))
        ref_points = jnp.tile(
            jnp.concatenate(refs, 0)[None, :, None, :], (b, 1, c.num_feature_levels, 1)
        )

        # ---- Encoder ------------------------------------------------------ #
        vision = flat
        for i in range(c.encoder_layers):
            vision, text = EncoderLayer(c, name=f"enc{i}")(
                vision, text, pos, text_pos_ids, text_sa_mask, text_pad_mask,
                ref_points, spatial_shapes,
            )

        # ---- Two-stage query selection ------------------------------------ #
        proposals = []
        for lvl, (h_, w_) in enumerate(spatial_shapes):
            yy, xx = jnp.meshgrid(
                jnp.arange(h_, dtype=jnp.float32), jnp.arange(w_, dtype=jnp.float32), indexing="ij"
            )
            grid = jnp.stack([(xx.reshape(-1) + 0.5) / w_, (yy.reshape(-1) + 0.5) / h_], -1)
            wh = jnp.full_like(grid, 0.05 * (2.0**lvl))
            proposals.append(jnp.concatenate([grid, wh], -1))
        output_proposals = jnp.tile(jnp.concatenate(proposals, 0)[None], (b, 1, 1))
        valid = jnp.all((output_proposals > 0.01) & (output_proposals < 0.99), -1, keepdims=True)
        output_proposals = jnp.where(valid, _inv_sigmoid(output_proposals), jnp.inf)

        oq = jnp.where(valid, vision, 0.0)
        oq = nn.Dense(c.d_model, dtype=c.dtype, name="enc_output")(oq)
        oq = nn.LayerNorm(dtype=c.dtype, name="enc_output_norm")(oq)

        # Contrastive class logits vs text, box deltas.
        def contrastive(x):
            logits = jnp.einsum("bqd,btd->bqt", x, text)
            logits = jnp.where(text_pad_mask[:, None, :], -jnp.inf, logits)
            pad = jnp.full((*logits.shape[:-1], c.max_text_len - logits.shape[-1]), -jnp.inf)
            return jnp.concatenate([logits, pad], axis=-1)

        enc_logits = contrastive(oq)
        enc_boxes_logits = MLPHead(c.d_model, 4, 3, c.dtype, name="enc_bbox_head")(oq) + output_proposals

        topk_scores = jnp.max(jnp.where(jnp.isfinite(enc_logits), enc_logits, -jnp.inf), axis=-1)
        _, topk_idx = jax.lax.top_k(topk_scores, c.num_queries)
        topk_boxes = jnp.take_along_axis(enc_boxes_logits, topk_idx[..., None], axis=1)
        reference = jax.nn.sigmoid(topk_boxes)  # [B, Q, 4]

        query_embeds = self.param(
            "query_embeds", nn.initializers.normal(0.02), (c.num_queries, c.d_model)
        )
        hidden = jnp.tile(query_embeds[None].astype(c.dtype), (b, 1, 1))

        # ---- Decoder with box refinement ----------------------------------- #
        bbox_heads = [MLPHead(c.d_model, 4, 3, c.dtype, name=f"dec_bbox{i}") for i in range(c.decoder_layers)]
        final_ln = nn.LayerNorm(dtype=c.dtype, name="decoder_ln")
        ref_head = MLPHead(c.d_model, c.d_model, 2, c.dtype, name="ref_point_head")
        inter_refs = []
        inter_hidden = []
        for i in range(c.decoder_layers):
            ref_in = jnp.tile(reference[:, :, None, :], (1, 1, c.num_feature_levels, 1))
            query_pos = ref_head(box_sine_embed(reference, c.d_model))  # d_model//2 per coord
            hidden = DecoderLayer(c, name=f"dec{i}")(
                hidden, query_pos, ref_in, vision, text, text_pad_mask, spatial_shapes
            )
            delta = bbox_heads[i](final_ln(hidden))
            reference = jax.nn.sigmoid(delta + _inv_sigmoid(reference))
            inter_refs.append(reference)
            inter_hidden.append(final_ln(hidden))

        logits = contrastive(inter_hidden[-1])
        return logits, inter_refs[-1]


class GroundingDinoDetector:
    """Detection front end (reference usage: boxes from text prompt).

    Note: requires a BERT WordPiece tokenizer for real prompts; `detect`
    accepts pre-tokenized ids. from_weights loads converted .npz params.
    """

    def __init__(self, config: GroundingDinoConfig, params, image_size: int = 800, vocab_path: str | None = None):
        self.config = config
        self.model = GroundingDino(config)
        self.params = jax.tree.map(jnp.asarray, params)
        self.image_size = image_size
        self.tokenizer = None
        if vocab_path:
            from freepose_tpu.models.wordpiece import WordPieceTokenizer

            self.tokenizer = WordPieceTokenizer(vocab_path)

        @jax.jit
        def _fwd(params, img, ids, sa, pos, pad):
            return self.model.apply({"params": params}, img, ids, sa, pos, pad)

        self._fwd = _fwd

    @classmethod
    def from_weights(cls, weights_path: str | None, config: GroundingDinoConfig | None = None):
        import os

        from scripts.common import load_params

        cfg = config or (GDINO_TEST if os.environ.get("FREEPOSE_TINY_MODELS") else GroundingDinoConfig())
        if weights_path:
            params = load_params(weights_path)
        else:
            model = GroundingDino(cfg)
            size = 64 if os.environ.get("FREEPOSE_TINY_MODELS") else 256
            ids = np.full((1, 6), 103)
            ids[:, 0], ids[:, -1] = 101, 102
            sa, pos = text_token_masks(ids)
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 3, size, size)), jnp.asarray(ids),
                jnp.asarray(sa), jnp.asarray(pos), jnp.zeros((1, 6), bool),
            )["params"]
        return cls(cfg, params)

    def _prompt_ids(self, input_ids, text: str) -> np.ndarray:
        if input_ids is not None:
            return np.asarray(input_ids)
        if self.tokenizer is not None:
            return np.asarray([self.tokenizer.encode(text)])
        # Placeholder prompt ids when no WordPiece vocab is wired.
        return np.array([[101, 103, 1012, 102]])

    def _prepare(self, image: np.ndarray) -> jax.Array:
        from freepose_tpu.ops.sampling import resize_bilinear

        img = jnp.asarray(image, jnp.float32) / (255.0 if image.dtype == np.uint8 else 1.0)
        mean = jnp.asarray([0.485, 0.456, 0.406]).reshape(3, 1, 1)
        std = jnp.asarray([0.229, 0.224, 0.225]).reshape(3, 1, 1)
        return (resize_bilinear(img.transpose(2, 0, 1), (self.image_size, self.image_size)) - mean) / std

    def detect(self, image: np.ndarray, input_ids: np.ndarray | None = None,
               text: str = "objects.", box_threshold: float = 0.15, text_threshold: float = 0.15):
        """image [H, W, 3] -> (boxes xyxy pixels [N, 4], scores [N])."""
        return self.detect_batch([image], input_ids, text, box_threshold)[0]

    def detect_topk_device(self, image, k: int = 25,
                           input_ids: np.ndarray | None = None,
                           text: str = "objects."):
        """STATIC-SHAPE detection, fully device-resident: forward + per-query
        score + top-`k` selection in one jit, returning
        (boxes xyxy pixels [k, 4], scores [k]) as DEVICE arrays — nothing is
        fetched, so per-frame proposal pipelines (detect -> SAM2 box prompts
        -> retrieval) chain on device with a single fetch at the end. The
        reference flow keeps the top-25 proposals after thresholding
        (extract_proposals_ground.py top_k=25); this is that selection with
        low-score entries carried alongside their scores for the caller to
        mask instead of a host round trip per stage."""
        ids = self._prompt_ids(input_ids, text)
        sa, pos = text_token_masks(ids)
        pad = np.zeros(ids.shape, bool)
        h, w = image.shape[:2]
        return _detect_topk_jit(
            self, self.params, jnp.asarray(image), jnp.asarray(ids),
            jnp.asarray(sa), jnp.asarray(pos), jnp.asarray(pad),
            jnp.float32(w), jnp.float32(h), k=k,
        )

    def detect_batch(self, images, input_ids: np.ndarray | None = None,
                     text: str = "objects.", box_threshold: float = 0.15):
        """Batched detection: list of [H, W, 3] images sharing one text
        prompt -> list of (boxes xyxy pixels [N_i, 4], scores [N_i]). One jit
        dispatch for the whole batch (the reference runs HF GroundingDINO one
        image at a time, extract_proposals_ground.py:48-75); only the
        variable-count thresholding happens on host."""
        ids = self._prompt_ids(input_ids, text)
        sa, pos = text_token_masks(ids)
        pad = np.zeros(ids.shape, bool)
        batch = jnp.stack([self._prepare(img) for img in images])
        n = len(images)
        ids_b = np.repeat(ids, n, axis=0) if ids.shape[0] == 1 and n > 1 else ids
        sa_b = np.repeat(sa, n, axis=0) if sa.shape[0] == 1 and n > 1 else sa
        pos_b = np.repeat(pos, n, axis=0) if pos.shape[0] == 1 and n > 1 else pos
        pad_b = np.repeat(pad, n, axis=0) if pad.shape[0] == 1 and n > 1 else pad
        logits, boxes = self._fwd(
            self.params, batch, jnp.asarray(ids_b), jnp.asarray(sa_b),
            jnp.asarray(pos_b), jnp.asarray(pad_b),
        )
        probs = jax.nn.sigmoid(logits)
        all_scores = np.asarray(jnp.max(jnp.where(jnp.isfinite(logits), probs, 0.0), axis=-1))
        out = []
        for i, image in enumerate(images):
            h, w = image.shape[:2]
            scores = all_scores[i]
            keep = scores > box_threshold
            cxcywh = np.asarray(boxes[i])[keep]
            xyxy = np.stack([
                (cxcywh[:, 0] - cxcywh[:, 2] / 2) * w,
                (cxcywh[:, 1] - cxcywh[:, 3] / 2) * h,
                (cxcywh[:, 0] + cxcywh[:, 2] / 2) * w,
                (cxcywh[:, 1] + cxcywh[:, 3] / 2) * h,
            ], axis=1) if keep.any() else np.zeros((0, 4), np.float32)
            out.append((xyxy, scores[keep]))
        return out


@partial(jax.jit, static_argnames=("det", "k"))
def _detect_topk_jit(det, params, image, ids, sa, pos, pad, w, h, *, k):
    """Resize+normalize + GroundingDINO forward + sigmoid-max score + top-k +
    cxcywh->xyxy pixel boxes, ONE program with device outputs (detector is a
    static arg by identity; params enter as arguments — see
    models/dinov2._extract_jit)."""
    from freepose_tpu.ops.sampling import resize_bilinear

    img = image.astype(jnp.float32)
    if image.dtype == jnp.uint8:
        img = img / 255.0
    mean = jnp.asarray([0.485, 0.456, 0.406]).reshape(3, 1, 1)
    std = jnp.asarray([0.229, 0.224, 0.225]).reshape(3, 1, 1)
    prep = (resize_bilinear(img.transpose(2, 0, 1), (det.image_size, det.image_size)) - mean) / std
    logits, boxes = det.model.apply({"params": params}, prep[None], ids, sa, pos, pad)
    probs = jax.nn.sigmoid(logits[0])
    scores = jnp.max(jnp.where(jnp.isfinite(logits[0]), probs, 0.0), axis=-1)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    bb = boxes[0][top_idx]  # [k, 4] cxcywh normalized
    xyxy = jnp.stack([
        (bb[:, 0] - bb[:, 2] / 2) * w,
        (bb[:, 1] - bb[:, 3] / 2) * h,
        (bb[:, 0] + bb[:, 2] / 2) * w,
        (bb[:, 1] + bb[:, 3] / 2) * h,
    ], axis=1)
    return xyxy, top_scores
