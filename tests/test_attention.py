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


def test_flash_extreme_logits_stable():
    # Large-magnitude logits: online softmax must not overflow.
    q = jnp.ones((1, 1, 16, 32)) * 30.0
    k = jnp.ones((1, 1, 16, 32)) * 30.0
    v = jnp.tile(jnp.arange(16.0)[None, None, :, None], (1, 1, 1, 32))
    out = flash_attention(q, k, v, 1.0, block_q=8, block_k=8, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), np.full(32, 7.5), atol=1e-3)
