"""DINOv2 parity tests: our Flax model vs HF transformers torch CPU model
with converted weights (random-init — no downloads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models.convert import dinov2_from_hf
from freepose_tpu.models.dinov2 import (
    DinoFeatureExtractor,
    DinoV2,
    DinoV2Config,
    normalize_images,
    split_tokens,
)

CFG = DinoV2Config(hidden_size=64, num_layers=3, num_heads=4, patch_size=14, image_size=56)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    torch.manual_seed(0)
    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        intermediate_size=int(CFG.hidden_size * CFG.mlp_ratio),
        patch_size=CFG.patch_size,
        image_size=CFG.image_size,
        num_register_tokens=CFG.num_registers,
        layerscale_value=0.5,  # nonzero so layerscale actually mixes
        hidden_act="gelu",
    )
    model = Dinov2WithRegistersModel(hf_cfg).eval()
    params = dinov2_from_hf(model.state_dict(), CFG.num_layers)
    return model, params


def test_forward_parity_native_grid(hf_pair):
    model, params = hf_pair
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(img)).last_hidden_state.numpy()
    ours = np.asarray(DinoV2(CFG).apply({"params": params}, jnp.asarray(img)))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_forward_parity_interpolated_grid(hf_pair):
    model, params = hf_pair
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, 84, 84)).astype(np.float32)  # 6x6 patches vs native 4x4
    with torch.no_grad():
        ref = model(torch.tensor(img)).last_hidden_state.numpy()
    ours = np.asarray(DinoV2(CFG).apply({"params": params}, jnp.asarray(img)))
    assert ours.shape == ref.shape == (1, 1 + 4 + 36, 64)
    # Interpolation kernels differ slightly (jax.image vs torch bicubic);
    # demand tight but not bit-exact agreement.
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_truncated_layer_changes_output(hf_pair):
    _, params = hf_pair
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(size=(1, 3, 56, 56)).astype(np.float32))
    full = DinoV2(CFG).apply({"params": params}, img)
    trunc = DinoV2(CFG).apply({"params": params}, img, layer=2)
    assert full.shape == trunc.shape
    assert not np.allclose(np.asarray(full), np.asarray(trunc))


def test_feature_extractor_api(hf_pair):
    _, params = hf_pair
    fe = DinoFeatureExtractor(CFG, params=params)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((2, 3, 56, 56)).astype(np.float32))
    patch = fe(img, layer=2, feature_type="patch")
    cls = fe(img, layer=2, feature_type="cls")
    reg = fe(img, layer=2, feature_type="reg")
    assert patch.shape == (2, 16, 64)
    assert cls.shape == (2, 64)
    assert reg.shape == (2, 4, 64)


def test_normalize_images():
    img = jnp.ones((1, 3, 4, 4)) * 0.5
    out = np.asarray(normalize_images(img))
    np.testing.assert_allclose(out[0, 0], (0.5 - 0.485) / 0.229, atol=1e-6)
    np.testing.assert_allclose(out[0, 2], (0.5 - 0.406) / 0.225, atol=1e-6)


def test_split_tokens_partition():
    tokens = jnp.arange(2 * 21 * 8).reshape(2, 21, 8).astype(jnp.float32)
    parts = split_tokens(tokens, 4)
    assert parts["cls"].shape == (2, 8)
    assert parts["reg"].shape == (2, 4, 8)
    assert parts["patch"].shape == (2, 16, 8)
    np.testing.assert_array_equal(
        np.concatenate([parts["cls"][:, None], parts["reg"], parts["patch"]], axis=1),
        np.asarray(tokens),
    )


def test_extract_sharded_matches_single_device():
    """Batch-sharded extraction over the 8-device CPU mesh == single-device,
    including uneven batches (padding sliced off)."""
    import jax

    from freepose_tpu.models.dinov2 import VIT_TEST, DinoFeatureExtractor

    assert len(jax.devices()) == 8
    fe = DinoFeatureExtractor(VIT_TEST)
    rng = np.random.default_rng(0)
    size = VIT_TEST.image_size
    for n in (8, 5):  # even and uneven batch
        imgs = jnp.asarray(rng.random((n, 3, size, size)), jnp.float32)
        ref = fe(imgs, layer=2, feature_type="patch")
        got = fe.extract_sharded(imgs, layer=2, feature_type="patch")
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
