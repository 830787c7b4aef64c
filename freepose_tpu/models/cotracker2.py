"""CoTracker2 — the released architecture (facebookresearch/co-tracker), in Flax.

The reference loads `torch.hub.load("facebookresearch/co-tracker", "cotracker2")`
and calls it with explicit query points + backward tracking (reference
src/pipeline/estimators/tracking_refiner.py:24,160-166). This module
re-implements that released architecture at the state-dict level so the
published checkpoint converts directly (freepose_tpu.models.convert
.cotracker2_from_hub), unlike models/cotracker.py whose CoTracker-STYLE
tracker + weight-free ZNCC path predate it and remain the no-checkpoint
fallback.

Architecture (CoTracker2: window_len=8, stride=4, model res 384x512):
  - BasicEncoder `fnet`: stride-2 stem + 4 residual stages (instance norms —
    no affine params), every stage bilinearly upsampled (align_corners) to
    stride 4 and fused by a 3x3 + 1x1 conv head -> 128-d feature maps.
  - Per-iteration correlation: full [S, N, H*W] dot-product volumes over a
    4-level avg-pool pyramid (one MXU matmul per level), then a 7x7
    unit-spaced window bilinearly sampled around each track with BORDER
    padding. On TPU the window sample is two separable hat-weight matmuls
    (regular tap grids are outer products; arbitrary-index gathers lower to
    scalar loads — same trick as ops/sampling.roi_align).
  - EfficientUpdateFormer: tokens [N + 64 virtual, S, 384]; 6 time-attention
    blocks, each followed by a space step (virtual<-point cross-attn,
    virtual self-attn, point<-virtual cross-attn), scanned as one layer
    stack. Attention is to_q/to_kv with 8 heads of 48; pre-norms are
    affine-free LayerNorms; MLPs use tanh-approx GELU.
  - Head: flow_head -> [dx, dy, 128 feature delta]; track features update by
    `feat += GELU(Linear(GroupNorm1(delta_feat)))`; visibility is a linear
    probe on the final track features.
  - Online sliding windows of 8 frames, step 4: window w>0 initialises its
    first 4 frames from the previous window's overlap predictions and
    extrapolates the rest from the last prediction.

Faithfulness: built to the published checkpoint layout and forward
semantics; the released torch code is not vendored on this image and no
checkpoint ships with it, so parity is validated structurally — the
converter is exercised against a torch twin of the published modules
(tests/test_cotracker2.py) and the checkpoint key->shape map — rather than
against released weights. All loops are static; the whole tracker jits as
one program per (T, N) shape.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CoTracker2Config:
    latent_dim: int = 128          # fnet output / track-feature dim
    stride: int = 4
    window_len: int = 8
    corr_levels: int = 4
    corr_radius: int = 3
    flow_emb_dim: int = 64         # get_2d_embedding dim (130 = 2*64+2 total)
    hidden_size: int = 384
    num_heads: int = 8
    depth: int = 6                 # time blocks; a space step follows each
    num_virtual_tracks: int = 64
    model_resolution: tuple = (384, 512)
    iters: int = 6                 # predictor default (model default is 4)
    dtype: jnp.dtype = jnp.float32
    # None = backend-default matmul/conv algorithm (fast on TPU). Parity
    # tests pin "highest": XLA CPU's default algorithm drifts ~3e-2 on these
    # shapes, which the iterative tracker loop then amplifies.
    precision: str | None = None

    @property
    def input_dim(self) -> int:
        """Transformer token dim: flow emb + corr windows + feat + mask/vis.
        456 for the released model."""
        d = 2 * self.corr_radius + 1
        return (2 * self.flow_emb_dim + 2) + self.corr_levels * d * d + self.latent_dim + 2


COTRACKER2 = CoTracker2Config()
assert COTRACKER2.input_dim == 456  # released checkpoint layout

# Tiny config for tests: same topology, small dims (input_dim and latent_dim
# must stay divisible by 4: half/half sincos pos embedding, encoder skip dims).
COTRACKER2_TEST = CoTracker2Config(
    latent_dim=16, corr_levels=4, corr_radius=1, flow_emb_dim=16,
    hidden_size=64, num_heads=4, depth=2, num_virtual_tracks=4,
    model_resolution=(64, 96), iters=2, precision="highest",
)
assert COTRACKER2_TEST.input_dim % 4 == 0


# ---------------------------------------------------------------------------
# sin/cos embeddings (matching cotracker/models/core/embeddings.py)
# ---------------------------------------------------------------------------

def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[M] positions -> [M, embed_dim]: cat(sin(pos*w), cos(pos*w))."""
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def time_embedding(embed_dim: int, window_len: int) -> np.ndarray:
    """The persistent `time_emb` buffer: [window_len, embed_dim]."""
    return _sincos_1d(embed_dim, np.arange(window_len, dtype=np.float64))


def pos_embedding_2d(embed_dim: int, grid_hw: tuple) -> np.ndarray:
    """The non-persistent `pos_emb` buffer as [H, W, embed_dim]. First half
    embeds the x (grid[0] after the reference's xy-meshgrid) coordinate,
    second half y."""
    h, w = grid_hw
    gy, gx = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij"
    )
    emb_x = _sincos_1d(embed_dim // 2, gx)
    emb_y = _sincos_1d(embed_dim // 2, gy)
    return np.concatenate([emb_x, emb_y], axis=1).reshape(h, w, embed_dim)


def flow_embedding(xy: jax.Array, dim: int = 64) -> jax.Array:
    """get_2d_embedding(xy, dim, cat_coords=True): [..., 2] -> [..., 2*dim+2]
    = [xy, interleaved sin/cos of x, interleaved sin/cos of y] with
    frequencies k * (1000 / dim)."""
    freqs = jnp.arange(0, dim, 2, dtype=jnp.float32) * (1000.0 / dim)  # [dim/2]
    x = xy[..., 0:1] * freqs
    y = xy[..., 1:2] * freqs
    pe_x = jnp.stack([jnp.sin(x), jnp.cos(x)], axis=-1).reshape(*xy.shape[:-1], dim)
    pe_y = jnp.stack([jnp.sin(y), jnp.cos(y)], axis=-1).reshape(*xy.shape[:-1], dim)
    return jnp.concatenate([xy, pe_x, pe_y], axis=-1)


# ---------------------------------------------------------------------------
# Sampling: separable bilinear taps (border / zeros padding).
# All sampling einsums pin precision='highest': the default dot precision
# decomposes batched 3-operand contractions through a low-precision path
# (measured 3e-2 absolute error on CPU), which breaks sub-pixel resampling.
# The cost is negligible — these are hat-weight matmuls, not the hot FLOPs.
# ---------------------------------------------------------------------------

def _hat_weights(pos: jax.Array, size: int, border: bool) -> jax.Array:
    """Bilinear hat weights of positions [...] against a [size] axis ->
    [..., size]. border=True clamps positions to the axis range
    (grid_sample padding_mode='border'); else out-of-range taps lose weight
    (padding_mode='zeros')."""
    if border:
        pos = jnp.clip(pos, 0.0, size - 1.0)
    src = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src - pos[..., None]))


def sample_features_nd(fmap: jax.Array, coords: jax.Array, border: bool = False) -> jax.Array:
    """fmap [H, W, C], coords [N, 2] (x, y) -> [N, C] bilinear samples as two
    hat-weight contractions (MXU) instead of per-point gathers."""
    h, w, _ = fmap.shape
    wy = _hat_weights(coords[:, 1], h, border)  # [N, H]
    wx = _hat_weights(coords[:, 0], w, border)  # [N, W]
    return jnp.einsum("nh,hwc,nw->nc", wy, fmap, wx, precision="highest")


def sample_windows(vol: jax.Array, centers: jax.Array, radius: int, border: bool = True) -> jax.Array:
    """vol [N, H, W], centers [N, 2] (x, y) -> [N, (2r+1)^2] unit-spaced
    window samples (the CorrBlock neighbourhood) via separable hat matmuls.

    Flat order matches the released CorrBlock.sample: the offset added to x
    varies SLOWEST (RAFT's meshgrid(dy, dx) is stacked onto (x, y) coords,
    so the first grid axis lands on x)."""
    n, h, w = vol.shape
    d = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    wy = _hat_weights(centers[:, 1:2] + offs[None], h, border)  # [N, d, H]
    wx = _hat_weights(centers[:, 0:1] + offs[None], w, border)  # [N, d, W]
    out = jnp.einsum("nkh,nhw,nlw->nlk", wy, vol, wx, precision="highest")
    return out.reshape(n, d * d)


def interpolate_bilinear(img: jax.Array, out_hw: tuple) -> jax.Array:
    """[H, W, C] -> [h, w, C] bilinear with align_corners=True (torch
    F.interpolate semantics used by both the encoder skip fusion and the
    predictor's video resize), as two dense weight matmuls."""
    h, w, _ = img.shape
    oh, ow = out_hw
    ys = jnp.arange(oh, dtype=jnp.float32) * ((h - 1) / max(oh - 1, 1))
    xs = jnp.arange(ow, dtype=jnp.float32) * ((w - 1) / max(ow - 1, 1))
    wy = _hat_weights(ys, h, border=True)  # [oh, H]
    wx = _hat_weights(xs, w, border=True)  # [ow, W]
    return jnp.einsum("yh,hwc,xw->yxc", wy, img, wx, precision="highest")


# ---------------------------------------------------------------------------
# BasicEncoder (fnet)
# ---------------------------------------------------------------------------

def _instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d(affine=False) over NHWC: normalize each (sample,
    channel) plane over H, W (biased variance, no running stats)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _ResBlock(nn.Module):
    """RAFT-style residual block, instance-norm variant (norms carry no
    params; only convs convert)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    precision: str | None = None

    @nn.compact
    def __call__(self, x):
        s = (self.stride, self.stride)
        pr = self.precision
        pad = [(1, 1), (1, 1)]  # torch padding=1 (flax SAME places stride-2 pads asymmetrically)
        y = nn.Conv(self.planes, (3, 3), strides=s, padding=pad, dtype=self.dtype,
                    precision=pr, name="conv1")(x)
        y = nn.relu(_instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=pad, dtype=self.dtype, precision=pr, name="conv2")(y)
        y = nn.relu(_instance_norm(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=s, padding="VALID", dtype=self.dtype,
                        precision=pr, name="down")(x)
            x = _instance_norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """fnet: [T, H, W, 3] -> [T, H/4, W/4, latent_dim]."""

    cfg: CoTracker2Config

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        c = self.cfg
        d = c.latent_dim
        out_hw = (images.shape[1] // c.stride, images.shape[2] // c.stride)
        x = nn.Conv(d // 2, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], dtype=c.dtype,
                    precision=c.precision, name="conv1")(images)
        x = nn.relu(_instance_norm(x))
        a = _ResBlock(d // 2, 1, c.dtype, c.precision, name="layer1_0")(x)
        a = _ResBlock(d // 2, 1, c.dtype, c.precision, name="layer1_1")(a)
        b = _ResBlock(d // 4 * 3, 2, c.dtype, c.precision, name="layer2_0")(a)
        b = _ResBlock(d // 4 * 3, 1, c.dtype, c.precision, name="layer2_1")(b)
        e3 = _ResBlock(d, 2, c.dtype, c.precision, name="layer3_0")(b)
        e3 = _ResBlock(d, 1, c.dtype, c.precision, name="layer3_1")(e3)
        e4 = _ResBlock(d, 2, c.dtype, c.precision, name="layer4_0")(e3)
        e4 = _ResBlock(d, 1, c.dtype, c.precision, name="layer4_1")(e4)
        up = jax.vmap(partial(interpolate_bilinear, out_hw=out_hw))
        x = jnp.concatenate([up(a), up(b), up(e3), up(e4)], axis=-1)
        x = nn.Conv(d * 2, (3, 3), padding=[(1, 1), (1, 1)], dtype=c.dtype, precision=c.precision,
                    name="conv2")(x)
        x = nn.relu(_instance_norm(x))
        return nn.Conv(d, (1, 1), padding="VALID", dtype=c.dtype, precision=c.precision, name="conv3")(x)


# ---------------------------------------------------------------------------
# EfficientUpdateFormer
# ---------------------------------------------------------------------------

class Attention(nn.Module):
    """cotracker blocks.Attention: to_q / fused to_kv / to_out."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    precision: str | None = None

    @nn.compact
    def __call__(self, x, context=None, attn_mask=None):
        """attn_mask: optional bool, broadcastable to [..., q, k]; True =
        masked OUT. Masked entries are replaced (jnp.where, not an additive
        -inf bias: XLA reassociates `(sim + bias) - rowmax` so a fully-masked
        row would silently become softmax(sim); torch eager gives uniform
        attention there, which this reproduces exactly)."""
        ctx = x if context is None else context
        h = self.heads
        hd = self.dim // h
        pr = self.precision
        q = nn.Dense(self.dim, dtype=self.dtype, precision=pr, name="to_q")(x)
        kv = nn.Dense(self.dim * 2, dtype=self.dtype, precision=pr, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(*q.shape[:-1], h, hd)
        k = k.reshape(*k.shape[:-1], h, hd)
        v = v.reshape(*v.shape[:-1], h, hd)
        sim = jnp.einsum("...qhd,...khd->...hqk", q, k, precision=pr) * (hd**-0.5)
        if attn_mask is not None:
            sim = jnp.where(attn_mask[..., None, :, :] if attn_mask.ndim == sim.ndim - 1 else attn_mask,
                            jnp.asarray(-1e30, sim.dtype), sim)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, v, precision=pr)
        out = out.reshape(*out.shape[:-2], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, precision=pr, name="to_out")(out)


def _ln_noaffine(x, eps=1e-6):
    """LayerNorm(elementwise_affine=False, eps=1e-6) — the AttnBlock/
    CrossAttnBlock pre-norms carry no params in the released checkpoint."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32
    precision: str | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, precision=self.precision, name="fc1")(x)
        x = nn.gelu(x, approximate=True)  # GELU(approximate="tanh")
        return nn.Dense(self.out, dtype=self.dtype, precision=self.precision, name="fc2")(x)


class AttnBlock(nn.Module):
    cfg: CoTracker2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = x + Attention(c.hidden_size, c.num_heads, c.dtype, c.precision, name="attn")(_ln_noaffine(x))
        return x + _Mlp(c.hidden_size * 4, c.hidden_size, c.dtype, c.precision, name="mlp")(_ln_noaffine(x))


class CrossAttnBlock(nn.Module):
    cfg: CoTracker2Config

    @nn.compact
    def __call__(self, x, context, attn_mask=None):
        c = self.cfg
        ctx = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="norm_context")(context)
        x = x + Attention(c.hidden_size, c.num_heads, c.dtype, c.precision, name="cross_attn")(
            _ln_noaffine(x), context=ctx, attn_mask=attn_mask
        )
        return x + _Mlp(c.hidden_size * 4, c.hidden_size, c.dtype, c.precision, name="mlp")(_ln_noaffine(x))


class _FormerLayer(nn.Module):
    """One time block + one space step (the released 6/6 interleave runs a
    space step after every time block)."""

    cfg: CoTracker2Config

    @nn.compact
    def __call__(self, carry, _):
        tokens, mask_ctx, mask_q = carry  # tokens [N+V, T, D]
        c = self.cfg
        v = c.num_virtual_tracks
        tokens = AttnBlock(c, name="time")(tokens)  # attention over T per token
        pts, virt = tokens[:-v], tokens[-v:]
        # space attention runs per frame: [T, n, D]
        pts_t = pts.transpose(1, 0, 2)
        virt_t = virt.transpose(1, 0, 2)
        virt_t = CrossAttnBlock(c, name="virtual2point")(virt_t, pts_t, attn_mask=mask_ctx)
        virt_t = AttnBlock(c, name="virtual")(virt_t)
        pts_t = CrossAttnBlock(c, name="point2virtual")(pts_t, virt_t, attn_mask=mask_q)
        tokens = jnp.concatenate([pts_t.transpose(1, 0, 2), virt_t.transpose(1, 0, 2)], axis=0)
        return (tokens, mask_ctx, mask_q), None


class EfficientUpdateFormer(nn.Module):
    cfg: CoTracker2Config

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        """x [N, T, input_dim], mask [T, N] bool (True = point exists) ->
        [N, T, latent_dim + 2] (dx, dy, feature delta)."""
        c = self.cfg
        n, t, _ = x.shape
        tokens = nn.Dense(c.hidden_size, dtype=c.dtype, precision=c.precision, name="input_transform")(x)
        virtual = self.param(
            "virtual_tracks", nn.initializers.normal(1.0), (c.num_virtual_tracks, 1, c.hidden_size)
        )
        tokens = jnp.concatenate([tokens, jnp.tile(virtual, (1, t, 1))], axis=0)

        if mask is None:
            mask_ctx = mask_q = None
        else:
            masked = ~mask  # [T, N] True = point does not exist yet
            mask_ctx = masked[:, None, None, :]  # masks point columns for virtual queries
            mask_q = masked[:, None, :, None]    # masked point rows see a uniform context
        scan = nn.scan(
            _FormerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.depth,
        )
        (tokens, _, _), _ = scan(c, name="layers")((tokens, mask_ctx, mask_q), None)
        tokens = tokens[: tokens.shape[0] - c.num_virtual_tracks]
        return nn.Dense(c.latent_dim + 2, dtype=c.dtype, precision=c.precision, name="flow_head")(tokens)


# ---------------------------------------------------------------------------
# Core model
# ---------------------------------------------------------------------------

def _avg_pool2(x: jax.Array) -> jax.Array:
    """[..., H, W] 2x2 avg pool stride 2 (floor), matching F.avg_pool2d."""
    h, w = x.shape[-2] // 2 * 2, x.shape[-1] // 2 * 2
    x = x[..., :h, :w]
    return x.reshape(*x.shape[:-2], h // 2, 2, w // 2, 2).mean(axis=(-3, -1))


class CoTracker2(nn.Module):
    """The full online model: sliding windows of `window_len`, step
    window_len // 2 (reference CoTracker2.forward)."""

    cfg: CoTracker2Config

    def setup(self):
        c = self.cfg
        self.fnet = BasicEncoder(c)
        self.updateformer = EfficientUpdateFormer(c)
        # GroupNorm(1, latent): flax normalizes over the feature axis when
        # given [M, C]; torch eps 1e-5.
        self.norm = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=c.dtype)
        self.track_feat_updater = nn.Dense(c.latent_dim, dtype=c.dtype, precision=c.precision)
        self.vis_predictor = nn.Dense(1, dtype=c.dtype, precision=c.precision)

    def _forward_window(self, fmaps, coords, track_feat, vis, track_mask, iters):
        """fmaps [S, Hf, Wf, C]; coords [S, N, 2] (feature px); track_feat
        [S, N, C]; vis (logit-scale channel) / track_mask [S, N] ->
        (coords, track_feat, vis_logits). Reference forward_window."""
        c = self.cfg
        s, n = coords.shape[:2]
        hf, wf = fmaps.shape[1:3]

        # correlation pyramid of feature maps (built once per window)
        pyr = []
        fm = fmaps.transpose(0, 3, 1, 2)  # [S, C, H, W]
        for _ in range(c.corr_levels):
            pyr.append(fm)
            fm = _avg_pool2(fm)

        track_mask_vis = jnp.stack([track_mask.astype(c.dtype), vis], axis=-1)  # [S, N, 2]
        pos_emb = jnp.asarray(pos_embedding_2d(c.input_dim, (hf, wf)))
        sampled_pos = sample_features_nd(pos_emb, coords[0])  # [N, E] (zeros pad)
        time_emb = jnp.asarray(time_embedding(c.input_dim, s))  # [S, E]

        for _ in range(iters):
            # corr volumes against the current track features + 7x7 windows
            corrs = []
            for lvl in range(c.corr_levels):
                fm_l = pyr[lvl]  # [S, C, H_l, W_l]
                vol = jnp.einsum(
                    "snc,schw->snhw", track_feat, fm_l, precision="highest"
                ) / jnp.sqrt(jnp.asarray(c.latent_dim, jnp.float32))
                win = jax.vmap(partial(sample_windows, radius=c.corr_radius))(
                    vol, coords / (2.0**lvl)
                )  # [S, N, d^2]
                corrs.append(win)
            fcorrs = jnp.concatenate(corrs, axis=-1)  # [S, N, L*d^2]

            flow_emb = flow_embedding(coords - coords[0:1], c.flow_emb_dim)
            tin = jnp.concatenate([flow_emb, fcorrs, track_feat, track_mask_vis], axis=-1)
            x = (tin + sampled_pos[None] + time_emb[:, None]).transpose(1, 0, 2)  # [N, S, E]
            delta = self.updateformer(x, mask=track_mask).transpose(1, 0, 2)  # [S, N, 2+C]
            coords = coords + delta[..., :2]
            dfeat = delta[..., 2:].reshape(s * n, c.latent_dim)
            upd = self.track_feat_updater(self.norm(dfeat))
            upd = nn.gelu(upd, approximate=False)  # torch nn.GELU() default
            track_feat = track_feat + upd.reshape(s, n, c.latent_dim)

        vis_logits = self.vis_predictor(track_feat)[..., 0]  # [S, N]
        return coords, track_feat, vis_logits

    def __call__(self, video, queries, iters: int | None = None):
        """video [T, H, W, 3] float in [0, 255]; queries [N, 3] (t, x, y) in
        pixels -> (tracks [T, N, 2] px, vis_logits [T, N])."""
        c = self.cfg
        iters = c.iters if iters is None else iters
        t_total = video.shape[0]
        n = queries.shape[0]
        s = c.window_len
        step = s // 2

        num_windows = max((t_total - s + step - 1) // step, 0) + 1
        t_pad = (num_windows - 1) * step + s
        if t_pad > t_total:
            video = jnp.concatenate([video, jnp.tile(video[-1:], (t_pad - t_total, 1, 1, 1))], axis=0)

        video = 2.0 * (video / 255.0) - 1.0
        fmaps = self.fnet(video)  # [Tp, Hf, Wf, C]

        q_frame = queries[:, 0].astype(jnp.int32)
        q_coords = queries[:, 1:] / c.stride  # feature px

        # Track features: sample the query-frame feature map at the query
        # point (identical to the reference's per-window sampling — a
        # window's fmaps are the same per-frame features).
        fmap_q = fmaps[q_frame]  # [N, Hf, Wf, C]
        track_feat_q = jax.vmap(lambda fm, xy: sample_features_nd(fm, xy[None])[0])(
            fmap_q, q_coords
        )  # [N, C]

        exists = jnp.arange(t_pad)[:, None] >= q_frame[None]  # [Tp, N]
        coords_out = jnp.tile(q_coords[None], (t_pad, 1, 1))
        vis_out = jnp.zeros((t_pad, n), c.dtype)

        for wi in range(num_windows):
            ind = wi * step
            fm_w = jax.lax.dynamic_slice_in_dim(fmaps, ind, s, axis=0)
            if wi == 0:
                coords_init = jnp.tile(q_coords[None], (s, 1, 1))
                vis_init = jnp.full((s, n), 10.0, c.dtype)
            else:
                prev = jax.lax.dynamic_slice_in_dim(coords_out, ind, step, axis=0)
                coords_init = jnp.concatenate([prev] + [prev[-1:]] * (s - step), axis=0)
                pv = jax.lax.dynamic_slice_in_dim(vis_out, ind, step, axis=0)
                vis_init = jnp.concatenate([pv] + [pv[-1:]] * (s - step), axis=0)
            track_mask = jax.lax.dynamic_slice_in_dim(exists, ind, s, axis=0)
            tf = jnp.tile(track_feat_q[None], (s, 1, 1))
            coords_w, _, vis_w = self._forward_window(
                fm_w, coords_init, tf, vis_init, track_mask, iters
            )
            # Commit only frames where the point exists; points whose query
            # frame is later stay pinned at their query coordinates.
            old_c = jax.lax.dynamic_slice_in_dim(coords_out, ind, s, axis=0)
            old_v = jax.lax.dynamic_slice_in_dim(vis_out, ind, s, axis=0)
            coords_w = jnp.where(track_mask[..., None], coords_w, old_c)
            vis_w = jnp.where(track_mask, vis_w, old_v)
            coords_out = jax.lax.dynamic_update_slice_in_dim(coords_out, coords_w, ind, axis=0)
            vis_out = jax.lax.dynamic_update_slice_in_dim(vis_out, vis_w, ind, axis=0)

        tracks = coords_out[:t_total] * c.stride
        return tracks, vis_out[:t_total]


# ---------------------------------------------------------------------------
# Predictor wrapper (torch.hub CoTrackerPredictor equivalent)
# ---------------------------------------------------------------------------

def support_grid(size: int, extent_hw: tuple) -> np.ndarray:
    """get_points_on_a_grid: size x size points with margin extent_w / 64."""
    h, w = extent_hw
    margin = w / 64.0
    ys = np.linspace(margin, h - margin, size)
    xs = np.linspace(margin, w - margin, size)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)


@partial(jax.jit, static_argnames=("apply_fn", "out_hw", "iters"))
def _run_model(apply_fn, params, video, queries, out_hw, iters):
    v = jax.vmap(partial(interpolate_bilinear, out_hw=out_hw))(video)
    tracks, vis_logits = apply_fn({"params": params}, v, queries, iters)
    return tracks, jax.nn.sigmoid(vis_logits)


class CoTracker2Predictor:
    """Reference CoTrackerPredictor semantics: resize video to the model
    resolution (bilinear, align_corners), append a support grid at frame 0,
    forward (+ optional backward pass on the reversed video merged into
    pre-query frames), threshold visibility at 0.9, pin query frames,
    rescale tracks back to the input resolution."""

    def __init__(self, params, config: CoTracker2Config = COTRACKER2, support_grid_size: int = 6):
        self.cfg = config
        self.params = jax.tree.map(jnp.asarray, params)
        self.model = CoTracker2(config)
        self.support_grid_size = support_grid_size

    @staticmethod
    def init_params(config: CoTracker2Config, seed: int = 0):
        model = CoTracker2(config)
        h, w = config.model_resolution
        video = jnp.zeros((config.window_len, h, w, 3))
        queries = jnp.zeros((2, 3))
        return model.init(jax.random.PRNGKey(seed), video, queries, 1)["params"]

    def __call__(self, video: np.ndarray, queries: np.ndarray, backward_tracking: bool = True):
        """video [T, H, W, 3] uint8/float 0-255; queries [N, 3] (t, x, y)
        pixel coords -> (tracks [T, N, 2] px, visibility [T, N] bool)."""
        cfg = self.cfg
        t, h, w = video.shape[:3]
        mh, mw = cfg.model_resolution
        v = jnp.asarray(video, jnp.float32)

        q = np.asarray(queries, np.float32).copy()
        q[:, 1] *= (mw - 1) / (w - 1)
        q[:, 2] *= (mh - 1) / (h - 1)
        sg = support_grid(self.support_grid_size, (mh, mw))
        q_all = np.concatenate(
            [q, np.concatenate([np.zeros((len(sg), 1), np.float32), sg], axis=1)], axis=0
        )

        tracks, vis = _run_model(self.model.apply, self.params, v, jnp.asarray(q_all), (mh, mw), cfg.iters)

        # The backward pass only contributes to frames strictly BEFORE a
        # query's frame (`before` mask below) — when every query sits on
        # frame 0 (the smooth interval layout) it would merge into zero
        # frames, so skipping it halves the tracker cost at exact parity.
        if backward_tracking and float(q_all[:, 0].max()) <= 0:
            backward_tracking = False
        if backward_tracking:
            inv_q = q_all.copy()
            inv_q[:, 0] = t - 1 - inv_q[:, 0]
            inv_tracks, inv_vis = _run_model(
                self.model.apply, self.params, v[::-1], jnp.asarray(inv_q), (mh, mw), cfg.iters
            )
            inv_tracks = inv_tracks[::-1]
            inv_vis = inv_vis[::-1]
            before = jnp.arange(t)[:, None] < jnp.asarray(q_all[:, 0])[None]
            tracks = jnp.where(before[..., None], inv_tracks, tracks)
            vis = jnp.where(before, inv_vis, vis)

        tracks = np.array(tracks[:, : len(q)])
        vis = np.array(vis[:, : len(q)] > 0.9)
        # pin query frames to the query coordinates; queries are visible
        qt = np.asarray(queries)[:, 0].astype(int)
        ar = np.arange(len(qt))
        tracks[qt, ar] = q[:, 1:]
        vis[qt, ar] = True
        tracks *= np.array([(w - 1) / (mw - 1), (h - 1) / (mh - 1)], np.float32)
        return tracks, vis

    # smooth_track may hand this tracker the HBM-staged frame gather
    # directly (a [T, H, W, 3] device array) — the predictor casts/rescales
    # on device, so no host round-trip enters the tracking cost.
    accepts_device_video = True

    def track(self, video, queries: np.ndarray, query_frame: int = 0):
        """PointTracker.track-compatible front end (the TrackingRefiner
        tracker interface, reference tracking_refiner.py:160-166): queries
        [N, 2] (x, y) all on `query_frame`, bidirectional tracking.

        Video follows the PointTracker convention — uint8 in [0, 255] or
        float in [0, 1] (TrackingRefiner.track_frames passes [0, 1] floats);
        rescaled here to the predictor's 0-255 domain. May be a host numpy
        array or a device jax.Array (kept on device)."""
        if isinstance(video, jax.Array):
            v = video.astype(jnp.float32)
            if video.dtype != jnp.uint8:
                v = v * 255.0
        else:
            v = np.asarray(video, np.float32)
            if video.dtype != np.uint8:
                v = v * 255.0
        q = np.concatenate(
            [np.full((len(queries), 1), float(query_frame), np.float32),
             np.asarray(queries, np.float32)], axis=1
        )
        return self(v, q, backward_tracking=True)
