"""SAM2 video memory: RoPE memory attention + memory encoder, in Flax.

TPU-native re-implementation of the vendored memory stack (reference
segment-anything-2/sam2/modeling/memory_attention.py:17-169, memory RoPE at
sam/transformer.py:289-360 and position_encoding.py:167-216, memory encoder
at memory_encoder.py:17-181).

TPU-first: the memory bank is FIXED CAPACITY — 7 spatial mask memories + 16
object-pointer tokens, padded and masked — so every per-frame step is one jit
program with static shapes (the reference instead concatenates a variable
number of dict entries, sam2_base.py:493-662). Masked softmax over the padded
memory is numerically identical to concatenating only the live entries.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MemoryConfig:
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 1
    downsample_rate: int = 1
    ff_hidden: int = 2048
    rope_theta: float = 10000.0
    rope_feat_size: int = 64  # memory/current feature grid side
    mem_dim: int = 64  # memory channel dim (kv input to cross attention)
    num_maskmem: int = 7
    max_obj_ptrs: int = 16
    # Non-cond memory frames taken from every r-th frame (+ always the last
    # frame), the reference's long-video memory subsampling
    # (memory_temporal_stride_for_eval, sam2_base.py:528-563). r=1 keeps the
    # consecutive-frame ring; object pointers are stride-independent.
    memory_temporal_stride: int = 1
    # memory encoder
    enc_hidden: int = 256
    fuser_layers: int = 2
    fuser_intermediate: int = 1024
    fuser_kernel: int = 7
    mask_down_kernel: int = 3
    mask_down_stride: int = 2
    mask_down_total_stride: int = 16
    sigmoid_scale: float = 20.0
    sigmoid_bias: float = -10.0
    dtype: jnp.dtype = jnp.float32
    # Pallas flash attention (TPU): self-attn uses the full-KV kernel, the
    # ~28k-key cross-attn streams K/V blocks with the padded-slot mask folded
    # into the kernel (SURVEY.md §2.6.3 "RoPE cross-attention" native item).
    use_flash: bool = False


def rope_2d_cos_sin(head_dim: int, grid: int, theta: float = 10000.0):
    """Axial 2D RoPE tables [grid*grid, head_dim] (cos, sin), matching the
    reference's complex-exponential formulation (position_encoding.py:167-216).
    """
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 4)[: head_dim // 4] / head_dim))
    idx = np.arange(grid * grid)
    x = idx % grid
    y = idx // grid
    fx = np.outer(x, freqs)
    fy = np.outer(y, freqs)
    f = np.concatenate([fx, fy], axis=-1)
    f = np.repeat(f, 2, axis=-1)  # interleave pairs
    return jnp.asarray(np.cos(f), jnp.float32), jnp.asarray(np.sin(f), jnp.float32)


def _rotate_pairwise(x: jax.Array) -> jax.Array:
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def apply_rope_2d(q, k, cos, sin, num_k_exclude: int = 0, repeat_freqs_k: bool = False):
    """Rotate q (fully) and the first (len(k) - num_k_exclude) keys."""
    qf = q.astype(jnp.float32)
    q_rot = qf * cos + _rotate_pairwise(qf) * sin

    n_rot = k.shape[-2] - num_k_exclude
    k_rot_part = k[..., :n_rot, :].astype(jnp.float32)
    if repeat_freqs_k and n_rot != q.shape[-2]:
        rep = n_rot // q.shape[-2]
        cos_k = jnp.tile(cos, (rep, 1))
        sin_k = jnp.tile(sin, (rep, 1))
    else:
        cos_k, sin_k = cos, sin
    k_rotated = k_rot_part * cos_k + _rotate_pairwise(k_rot_part) * sin_k
    k_out = jnp.concatenate([k_rotated.astype(k.dtype), k[..., n_rot:, :]], axis=-2)
    return q_rot.astype(q.dtype), k_out


class RopeAttention(nn.Module):
    cfg: MemoryConfig
    kv_in_dim: int | None = None
    rope_k_repeat: bool = False

    @nn.compact
    def __call__(self, q, k, v, cos, sin, num_k_exclude: int = 0, kv_mask=None):
        c = self.cfg
        inner = c.hidden_size // c.downsample_rate
        head_dim = inner // c.num_heads
        b = q.shape[0]

        def proj(x, name):
            return nn.Dense(inner, dtype=c.dtype, name=name).__call__(x).reshape(
                b, -1, c.num_heads, head_dim
            ).transpose(0, 2, 1, 3)

        qh = proj(q, "q")
        kh = proj(k, "k")
        vh = proj(v, "v")
        qh, kh = apply_rope_2d(qh, kh, cos, sin, num_k_exclude, self.rope_k_repeat)
        if c.use_flash:
            # RoPE is already applied above (with object-pointer exclusion),
            # so the kernel sees plain q/k/v; the slot-validity mask streams
            # alongside the K/V blocks.
            from freepose_tpu.ops.attention import flash_attention_auto

            out = flash_attention_auto(qh, kh, vh, head_dim**-0.5, kv_mask=kv_mask)
        else:
            logits = jnp.einsum("bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32)
            logits = logits * (head_dim**-0.5)
            if kv_mask is not None:
                logits = jnp.where(kv_mask[:, None, None, :], logits, -jnp.inf)
            w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", w, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, inner)
        return nn.Dense(c.hidden_size, dtype=c.dtype, name="out")(out)


class MemoryAttentionLayer(nn.Module):
    cfg: MemoryConfig

    @nn.compact
    def __call__(self, queries, memory, memory_pos, cos, sin, num_ptr_tokens, kv_mask):
        c = self.cfg
        q = nn.LayerNorm(dtype=c.dtype, name="ln1")(queries)
        q = RopeAttention(c, name="self_attn")(q, q, q, cos, sin)
        queries = queries + q
        q = nn.LayerNorm(dtype=c.dtype, name="ln2")(queries)
        q = RopeAttention(c, kv_in_dim=c.mem_dim, rope_k_repeat=True, name="cross_attn")(
            q, memory + memory_pos, memory, cos, sin, num_k_exclude=num_ptr_tokens, kv_mask=kv_mask
        )
        queries = queries + q
        q = nn.LayerNorm(dtype=c.dtype, name="ln3")(queries)
        q = nn.Dense(c.ff_hidden, dtype=c.dtype, name="fc1")(q)
        q = nn.relu(q)
        q = nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(q)
        return queries + q


class MemoryAttention(nn.Module):
    """Condition current-frame features on the (padded) memory bank."""

    cfg: MemoryConfig

    @nn.compact
    def __call__(
        self,
        curr_feats: jax.Array,  # [B, HW, hidden]
        curr_pos: jax.Array,  # [B, HW, hidden]
        memory: jax.Array,  # [B, M, mem_dim] (spatial mems then ptr tokens)
        memory_pos: jax.Array,  # [B, M, mem_dim]
        num_ptr_tokens: int,
        kv_mask: jax.Array,  # [B, M] bool validity
    ) -> jax.Array:
        c = self.cfg
        cos, sin = rope_2d_cos_sin(
            c.hidden_size // (c.downsample_rate * c.num_heads), c.rope_feat_size, c.rope_theta
        )
        out = curr_feats + 0.1 * curr_pos
        for i in range(c.num_layers):
            out = MemoryAttentionLayer(c, name=f"layer{i}")(
                out, memory, memory_pos, cos, sin, num_ptr_tokens, kv_mask
            )
        return nn.LayerNorm(dtype=c.dtype, name="ln_final")(out)


class CXBlock(nn.Module):
    """ConvNeXt block of the memory fuser (reference memory_encoder.py:62-96)."""

    cfg: MemoryConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, H, W, C]
        c = self.cfg
        d = x.shape[-1]
        h = nn.Conv(
            d, (c.fuser_kernel, c.fuser_kernel), padding=c.fuser_kernel // 2,
            feature_group_count=d, dtype=c.dtype, name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="ln")(h)
        h = nn.Dense(c.fuser_intermediate, dtype=c.dtype, name="pw1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=c.dtype, name="pw2")(h)
        gamma = self.param("scale", nn.initializers.constant(1e-6), (d,))
        return x + h * gamma.astype(c.dtype)


class MaskDownSampler(nn.Module):
    cfg: MemoryConfig

    @nn.compact
    def __call__(self, masks: jax.Array) -> jax.Array:  # [B, H, W, 1] -> [B, H/16, W/16, enc_hidden]
        c = self.cfg
        n_layers = int(np.log2(c.mask_down_total_stride) / np.log2(c.mask_down_stride))
        x = masks
        ch = 1
        for i in range(n_layers):
            ch = ch * c.mask_down_stride**2
            x = nn.Conv(
                ch, (c.mask_down_kernel, c.mask_down_kernel),
                strides=(c.mask_down_stride, c.mask_down_stride),
                padding=c.mask_down_kernel // 2, dtype=c.dtype, name=f"conv{i}",
            )(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name=f"ln{i}")(x)
            x = nn.gelu(x, approximate=False)
        return nn.Conv(c.enc_hidden, (1, 1), dtype=c.dtype, name="final_conv")(x)


class MemoryEncoder(nn.Module):
    """Fuse pixel features with the predicted mask into a mem_dim memory map
    (reference memory_encoder.py:99-181)."""

    cfg: MemoryConfig

    @nn.compact
    def __call__(self, pix_feats: jax.Array, masks: jax.Array):
        """pix_feats [B, H, W, enc_hidden]; masks [B, Him, Wim, 1] (already
        sigmoid-scaled). Returns (memory [B, H, W, mem_dim], pos [H, W, mem_dim])."""
        c = self.cfg
        m = MaskDownSampler(c, name="mask_down")(masks)
        x = nn.Conv(c.enc_hidden, (1, 1), dtype=c.dtype, name="feature_proj")(pix_feats)
        x = x + m
        for i in range(c.fuser_layers):
            x = CXBlock(c, name=f"fuser{i}")(x)
        x = nn.Conv(c.mem_dim, (1, 1), dtype=c.dtype, name="out_proj")(x)
        from freepose_tpu.models.sam2.hiera import sine_position_encoding

        pos = sine_position_encoding((x.shape[1], x.shape[2]), c.mem_dim)
        return x, pos


def sine_1d_pe(positions: jax.Array, dim: int, temperature: float = 10000.0) -> jax.Array:
    """[N] positions -> [N, dim] 1D sine PE (reference get_1d_sine_pe)."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pos = positions[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1)
