"""CLIP parity vs HF transformers CLIPModel (random-init, offline)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models.clip import Clip, ClipConfig, ClipFeatureExtractor, clip_normalize_images
from freepose_tpu.models.convert import clip_from_hf

CFG = ClipConfig(
    image_size=28, patch_size=14, vision_width=32, vision_layers=2, vision_heads=2,
    vocab_size=64, context_length=12, text_width=24, text_layers=2, text_heads=2,
    embed_dim=16, quick_gelu=True,  # HF default act for CLIP is quick_gelu
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(0)
    hf_cfg = CLIPConfig(
        text_config=dict(
            vocab_size=CFG.vocab_size, hidden_size=CFG.text_width,
            intermediate_size=int(CFG.text_width * 4), num_hidden_layers=CFG.text_layers,
            num_attention_heads=CFG.text_heads, max_position_embeddings=CFG.context_length,
            hidden_act="quick_gelu", eos_token_id=CFG.vocab_size - 1,
            projection_dim=CFG.embed_dim,
        ),
        vision_config=dict(
            hidden_size=CFG.vision_width, intermediate_size=int(CFG.vision_width * 4),
            num_hidden_layers=CFG.vision_layers, num_attention_heads=CFG.vision_heads,
            image_size=CFG.image_size, patch_size=CFG.patch_size, hidden_act="quick_gelu",
            projection_dim=CFG.embed_dim,
        ),
        projection_dim=CFG.embed_dim,
    )
    model = CLIPModel(hf_cfg).eval()
    params = clip_from_hf(model.state_dict(), CFG.vision_layers, CFG.text_layers)
    return model, params


def test_image_tower_parity(hf_pair):
    model, params = hf_pair
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(torch.tensor(img)).numpy()
    ours = np.asarray(
        Clip(CFG).apply({"params": params}, jnp.asarray(img), method=Clip.encode_image)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_text_tower_parity(hf_pair):
    model, params = hf_pair
    rng = np.random.default_rng(1)
    # ids with EOT (= max id) at a known position per row.
    ids = rng.integers(1, 50, size=(3, 12))
    eot_pos = [5, 8, 11]
    for r, p in enumerate(eot_pos):
        ids[r, p] = CFG.vocab_size - 1
        ids[r, p + 1 :] = 0
    with torch.no_grad():
        ref = model.get_text_features(torch.tensor(ids)).numpy()
    ours = np.asarray(
        Clip(CFG).apply({"params": params}, jnp.asarray(ids), method=Clip.encode_text)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_extractor_api(hf_pair):
    _, params = hf_pair
    fe = ClipFeatureExtractor(CFG, params=params)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((2, 3, 28, 28)).astype(np.float32))
    feats = fe.encode_image(img)
    assert feats.shape == (2, 16)
    ids = jnp.asarray(rng.integers(1, 63, size=(2, 12)))
    tfeats = fe.encode_text(ids)
    assert tfeats.shape == (2, 16)


def test_clip_normalize():
    img = jnp.ones((1, 3, 2, 2)) * 0.5
    out = np.asarray(clip_normalize_images(img))
    np.testing.assert_allclose(out[0, 0], (0.5 - 0.48145466) / 0.26862954, atol=1e-6)
