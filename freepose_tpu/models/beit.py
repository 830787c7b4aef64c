"""BEiT vision backbone (MiDaS 3.1 / ZoeDepth trunk), TPU-native.

The reference obtains ZoeDepth ZoeD_N from torch.hub
(reference scripts/generate_depth_zoe.py:14, compute_scale_video.py:40);
its trunk is a BEiT-L/16 with per-layer relative position biases and layer
scale. This implementation keeps HF-checkpoint parity (converter in
freepose_tpu.models.convert.zoedepth_from_hf) while staying XLA-friendly:

  * the whole depth runs as one `nn.scan` over stacked block params
    (1 compiled block instead of a 24-deep unrolled graph), collecting every
    block's output so the backbone taps (out_indices) are static selections;
  * the relative position index is a compile-time numpy table; each block
    gathers its own bias table (scanned param) into a [heads, N+1, N+1] bias;
  * no data-dependent shapes: the window is fixed by the input resolution.

Key-projection has no bias and the cls relative distances use the last three
table rows, matching the torch layout exactly.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BeitConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    image_size: int = 384
    layer_norm_eps: float = 1e-12
    layer_scale_init: float = 0.1
    out_indices: tuple = (6, 12, 18, 24)  # 1-indexed block taps
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # Pallas biased flash attention (TPU)


BEIT_TEST = BeitConfig(
    hidden_size=32, num_layers=4, num_heads=4, intermediate_size=64,
    patch_size=16, image_size=64, out_indices=(1, 2, 3, 4),
)


def relative_position_index(window: tuple[int, int]) -> np.ndarray:
    """[N+1, N+1] gather indices into the (2h-1)(2w-1)+3 bias table; the last
    three rows serve cls→token / token→cls / cls→cls."""
    h, w = window
    num_rel = (2 * h - 1) * (2 * w - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    n = h * w
    idx = np.zeros((n + 1, n + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


class BeitBlock(nn.Module):
    """One BEiT block: pre-LN attention with relative-position bias and layer
    scale, then pre-LN GELU MLP with layer scale."""

    config: BeitConfig
    window: tuple[int, int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.config
        d, nh = c.hidden_size, c.num_heads
        hd = d // nh
        n_tok = x.shape[1]

        # Table is sized by the PRETRAIN window (so checkpoints load at any
        # inference resolution); a runtime window mismatch bilinearly resizes
        # the spatial sub-table, keeping the 3 cls rows (the MiDaS-3.1
        # arbitrary-window scheme, HF modeling_beit.py:598-631 — including
        # its width/height-swapped reshape, kept for weight parity).
        pre = (c.image_size // c.patch_size, c.image_size // c.patch_size)
        num_rel_pre = (2 * pre[0] - 1) * (2 * pre[1] - 1) + 3
        table = self.param("rel_pos_table", nn.initializers.zeros, (num_rel_pre, nh))
        if self.window != pre:
            from freepose_tpu.ops.sampling import resize_bilinear

            oh, ow = 2 * pre[0] - 1, 2 * pre[1] - 1
            nh2, nw2 = 2 * self.window[0] - 1, 2 * self.window[1] - 1
            sub = table[: num_rel_pre - 3].reshape(ow, oh, nh).transpose(2, 0, 1)
            sub = resize_bilinear(sub, (nh2, nw2))  # [heads, nh2, nw2]
            sub = sub.transpose(1, 2, 0).reshape(nh2 * nw2, nh)
            table = jnp.concatenate([sub, table[num_rel_pre - 3:]], axis=0)
        idx = relative_position_index(self.window)
        bias = table[idx.reshape(-1)].reshape(n_tok, n_tok, nh).transpose(2, 0, 1)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln1")(x)
        q = nn.Dense(d, dtype=c.dtype, name="q")(h)
        k = nn.Dense(d, use_bias=False, dtype=c.dtype, name="k")(h)
        v = nn.Dense(d, dtype=c.dtype, name="v")(h)
        q = q.reshape(*q.shape[:-1], nh, hd).swapaxes(-3, -2)
        k = k.reshape(*k.shape[:-1], nh, hd).swapaxes(-3, -2)
        v = v.reshape(*v.shape[:-1], nh, hd).swapaxes(-3, -2)
        if c.use_flash:
            # Fused kernel streams K/V and the [heads, N, N] bias in blocks —
            # the dense path's fp32 logit tensor (92 MB at 480p) never
            # materializes (SURVEY.md §2.6.3).
            from freepose_tpu.ops.attention import flash_attention_bias_auto

            out = flash_attention_bias_auto(q, k, v, 1.0 / np.sqrt(hd), bias)
        else:
            logits = jnp.einsum("...hqd,...hkd->...hqk", q, k, preferred_element_type=jnp.float32)
            logits = logits / np.sqrt(hd) + bias
            attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("...hqk,...hkd->...hqd", attn, v)
        out = out.swapaxes(-3, -2).reshape(*x.shape[:-1], d)
        out = nn.Dense(d, dtype=c.dtype, name="proj")(out)
        lam1 = self.param("lambda_1", nn.initializers.constant(c.layer_scale_init), (d,))
        x = x + lam1 * out

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln2")(x)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=c.dtype, name="fc2")(h)
        lam2 = self.param("lambda_2", nn.initializers.constant(c.layer_scale_init), (d,))
        return x + lam2 * h


class BeitBackbone(nn.Module):
    """BEiT trunk -> (tuple of token-form taps [B, N+1, D] at out_indices,
    window) — HF BeitBackbone with reshape_hidden_states=False
    (modeling_beit.py:1421-1537); the whole depth is one nn.scan."""

    config: BeitConfig

    @nn.compact
    def __call__(self, pixels: jax.Array):
        c = self.config
        b = pixels.shape[0]
        h, w = pixels.shape[2], pixels.shape[3]
        window = (h // c.patch_size, w // c.patch_size)

        patches = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size), strides=(c.patch_size, c.patch_size),
            dtype=c.dtype, name="patch_embed",
        )(pixels.transpose(0, 2, 3, 1))
        tokens = patches.reshape(b, -1, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(tokens.dtype), (b, 1, c.hidden_size)), tokens], axis=1
        )

        class _Scan(nn.Module):
            cfg: BeitConfig
            window: tuple[int, int]

            @nn.compact
            def __call__(self, carry, _):
                y = BeitBlock(self.cfg, self.window, name="block")(carry)
                return y, y

        scanner = nn.scan(
            _Scan,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.num_layers,
        )(c, window, name="blocks")
        _, ys = scanner(x, None)  # ys: [L, B, N+1, D]
        return tuple(ys[i - 1] for i in c.out_indices), window
