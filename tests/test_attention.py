"""Pallas flash attention: parity vs dense attention (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.models.vit import dot_product_attention
from freepose_tpu.ops.attention import flash_attention


@pytest.mark.parametrize("n,nk,d", [(64, 64, 32), (100, 100, 48), (37, 901, 64)])
def test_flash_matches_dense(n, nk, d):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 3, n, d)).astype(np.float32)
    k = rng.normal(size=(2, 3, nk, d)).astype(np.float32)
    v = rng.normal(size=(2, 3, nk, d)).astype(np.float32)
    scale = d**-0.5
    ref = np.asarray(dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    got = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
        block_q=32, block_k=32, interpret=True,
    ))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_flash_bf16():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 70, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 2, 70, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 2, 70, 32)), jnp.bfloat16)
    ref = dot_product_attention(q, k, v, 32**-0.5)
    got = flash_attention(q, k, v, 32**-0.5, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


@pytest.mark.parametrize("n,nk,d,h", [(64, 64, 32, 2), (37, 300, 48, 1), (100, 517, 64, 3)])
def test_stream_matches_dense(n, nk, d, h):
    from freepose_tpu.ops.attention import dense_attention_masked, flash_attention_stream

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, h, nk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, h, nk, d)), jnp.float32)
    scale = d**-0.5
    ref = np.asarray(dense_attention_masked(q, k, v, scale))
    got = np.asarray(
        flash_attention_stream(q, k, v, scale, block_q=32, block_k=64, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("nk", [96, 517])
def test_stream_kv_mask_matches_dense(nk):
    """Masked keys (padded SAM2 memory slots) drop out exactly."""
    from freepose_tpu.ops.attention import dense_attention_masked, flash_attention_stream

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(2, 2, 48, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, nk, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 2, nk, 32)), jnp.float32)
    mask = jnp.asarray(rng.random((2, nk)) > 0.4)
    mask = mask.at[:, 0].set(True)  # ≥1 valid key per row (memory invariant)
    scale = 32**-0.5
    ref = np.asarray(dense_attention_masked(q, k, v, scale, kv_mask=mask))
    got = np.asarray(
        flash_attention_stream(q, k, v, scale, kv_mask=mask, block_q=16, block_k=64, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # An entirely-masked key block (tail) must contribute nothing: compare
    # against truncated dense with the same mask.
    mask2 = mask.at[:, nk // 2 :].set(False)
    ref2 = np.asarray(dense_attention_masked(q, k, v, scale, kv_mask=mask2))
    got2 = np.asarray(
        flash_attention_stream(q, k, v, scale, kv_mask=mask2, block_q=16, block_k=64, interpret=True)
    )
    np.testing.assert_allclose(got2, ref2, atol=2e-5)


def test_memory_attention_flash_parity():
    """SAM2 RopeAttention (self + masked RoPE cross) with the flash path ==
    the dense path, at reduced production-like shapes."""
    import freepose_tpu.ops.attention as att
    from freepose_tpu.models.sam2.memory import MemoryAttention, MemoryConfig

    cfg = MemoryConfig(
        hidden_size=64, num_layers=1, ff_hidden=128, rope_feat_size=8, mem_dim=16,
        num_maskmem=3, max_obj_ptrs=4,
    )
    rng = np.random.default_rng(4)
    hw = cfg.rope_feat_size**2
    m = 3 * hw + 4  # 3 spatial memories + 4 ptr tokens (padded bank)
    curr = jnp.asarray(rng.normal(size=(1, hw, 64)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(1, hw, 64)), jnp.float32)
    mem = jnp.asarray(rng.normal(size=(1, m, 16)), jnp.float32)
    mem_pos = jnp.asarray(rng.normal(size=(1, m, 16)), jnp.float32)
    kv_mask = jnp.asarray(rng.random((1, m)) > 0.3).at[:, :hw].set(True)

    model = MemoryAttention(cfg)
    params = model.init(jax.random.PRNGKey(0), curr, pos, mem, mem_pos, 4, kv_mask)
    ref = model.apply(params, curr, pos, mem, mem_pos, 4, kv_mask)

    model_f = MemoryAttention(cfg.__class__(**{**cfg.__dict__, "use_flash": True}))
    old = att.FORCE_INTERPRET
    att.FORCE_INTERPRET = True
    try:
        got = model_f.apply(params, curr, pos, mem, mem_pos, 4, kv_mask)
    finally:
        att.FORCE_INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_hiera_flash_parity():
    """Tiny Hiera with flash global blocks == dense."""
    import freepose_tpu.ops.attention as att
    from freepose_tpu.models.sam2.hiera import Hiera, HieraConfig

    base = dict(
        embed_dim=8, blocks_per_stage=(1, 1, 2, 1), embed_dim_per_stage=(8, 16, 32, 64),
        heads_per_stage=(1, 2, 4, 8), window_size_per_stage=(4, 4, 4, 4),
        global_attention_blocks=(3,), window_pos_bg_size=(2, 2),
    )
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, 3, 64, 64)), jnp.float32)
    model = Hiera(HieraConfig(**base))
    params = model.init(jax.random.PRNGKey(0), img)
    ref = model.apply(params, img)
    model_f = Hiera(HieraConfig(**base, use_flash=True))
    old = att.FORCE_INTERPRET
    att.FORCE_INTERPRET = True
    try:
        got = model_f.apply(params, img)
    finally:
        att.FORCE_INTERPRET = old
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=3e-5)


@pytest.mark.parametrize("n,nk,h", [(65, 65, 2), (100, 229, 3)])
def test_bias_stream_matches_dense(n, nk, h):
    from freepose_tpu.ops.attention import flash_attention_bias

    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=(2, h, n, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, h, nk, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, h, nk, 32)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(h, n, nk)), jnp.float32)
    scale = 32**-0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale + bias[None]
    ref = np.asarray(jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(logits, -1), v))
    got = np.asarray(
        flash_attention_bias(q, k, v, scale, bias, block_q=32, block_k=64, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_beit_block_flash_parity():
    """BEiT block (relative-position-bias attention) flash == dense."""
    import dataclasses

    import freepose_tpu.ops.attention as att
    from freepose_tpu.models.beit import BEIT_TEST, BeitBlock

    rng = np.random.default_rng(7)
    window = (4, 4)
    x = jnp.asarray(rng.normal(size=(1, 17, 32)), jnp.float32)
    block = BeitBlock(BEIT_TEST, window)
    params = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(params, x)
    block_f = BeitBlock(dataclasses.replace(BEIT_TEST, use_flash=True), window)
    old = att.FORCE_INTERPRET
    att.FORCE_INTERPRET = True
    try:
        got = block_f.apply(params, x)
    finally:
        att.FORCE_INTERPRET = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_flash_extreme_logits_stable():
    # Large-magnitude logits: online softmax must not overflow.
    q = jnp.ones((1, 1, 16, 32)) * 30.0
    k = jnp.ones((1, 1, 16, 32)) * 30.0
    v = jnp.tile(jnp.arange(16.0)[None, None, :, None], (1, 1, 1, 32))
    out = flash_attention(q, k, v, 1.0, block_q=8, block_k=8, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), np.full(32, 7.5), atol=1e-3)
