"""BERT text encoder in Flax (GroundingDINO's language tower).

The reference's GroundingDINO conditions detection on a text prompt
("objects.") through a BERT-base encoder (HF grounding-dino checkpoints,
reference scripts/extract_proposals_ground.py:48-52). Standard post-LN
transformer encoder with token/position/type embeddings; supports the
additive attention mask GroundingDINO builds over sub-sentence tokens.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    dtype: jnp.dtype = jnp.float32


BERT_TEST = BertConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=2, intermediate=64, max_position=32)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None) -> jax.Array:
        c = self.cfg
        b, n, _ = x.shape
        head_dim = c.hidden_size // c.num_heads

        def proj(t, name):
            return nn.Dense(c.hidden_size, dtype=c.dtype, name=name)(t).reshape(
                b, n, c.num_heads, head_dim
            ).transpose(0, 2, 1, 3)

        q, k, v = proj(x, "q"), proj(x, "k"), proj(x, "v")
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        logits = logits * (head_dim**-0.5)
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhnm,bhmd->bhnd", w, v).transpose(0, 2, 1, 3).reshape(b, n, c.hidden_size)
        attn = nn.Dense(c.hidden_size, dtype=c.dtype, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="attn_ln")(x + attn)
        h = nn.Dense(c.intermediate, dtype=c.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="out_ln")(x + h)


class Bert(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # [B, L]
        attention_mask: jax.Array | None = None,  # [B, L] or [B, L, L]
        token_type_ids: jax.Array | None = None,
        position_ids: jax.Array | None = None,
    ) -> jax.Array:
        c = self.cfg
        b, length = input_ids.shape
        tok = self.param("word_embeddings", nn.initializers.normal(0.02), (c.vocab_size, c.hidden_size))
        pos = self.param("position_embeddings", nn.initializers.normal(0.02), (c.max_position, c.hidden_size))
        typ = self.param("token_type_embeddings", nn.initializers.normal(0.02), (c.type_vocab, c.hidden_size))
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            position_ids = jnp.arange(length)[None].repeat(b, 0)
        x = tok[input_ids] + pos[position_ids] + typ[token_type_ids]
        x = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="embed_ln")(x.astype(c.dtype))

        if attention_mask is None:
            bias = None
        elif attention_mask.ndim == 2:
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        else:  # [B, L, L] pairwise mask (GroundingDINO's sub-sentence mask)
            bias = jnp.where(attention_mask[:, None] > 0, 0.0, -1e9)
        for i in range(c.num_layers):
            x = BertLayer(c, name=f"layer{i}")(x, bias)
        return x
