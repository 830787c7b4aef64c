"""Swin backbone parity vs HF SwinBackbone (random-init)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models.convert import swin_from_hf
from freepose_tpu.models.swin import SWIN_TEST, SwinBackbone


@pytest.fixture(scope="module")
def hf_swin():
    from transformers import SwinBackbone as HFSwinBackbone, SwinConfig as HFSwinConfig

    torch.manual_seed(0)
    cfg = HFSwinConfig(
        image_size=64, patch_size=4, embed_dim=16, depths=[1, 1, 2],
        num_heads=[1, 2, 4], window_size=4, out_features=["stage2", "stage3"],
        hidden_act="gelu", drop_path_rate=0.0,
    )
    model = HFSwinBackbone(cfg).eval()
    params = swin_from_hf(model.state_dict(), depths=[1, 1, 2], out_stages=[1, 2])
    return model, params


def test_swin_parity(hf_swin):
    model, params = hf_swin
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(img)).feature_maps
    ours = SwinBackbone(SWIN_TEST).apply({"params": params}, jnp.asarray(img))
    assert len(ours) == len(ref) == 2
    for i, (o, r) in enumerate(zip(ours, ref)):
        np.testing.assert_allclose(
            np.asarray(o).transpose(0, 3, 1, 2), r.numpy(), atol=3e-4, err_msg=f"stage {i}"
        )


def test_swin_parity_nonsquare_with_shift(hf_swin):
    # 96x64 input: stage maps big enough that shifted windows engage.
    model, params = hf_swin
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, 96, 64)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(img)).feature_maps
    ours = SwinBackbone(SWIN_TEST).apply({"params": params}, jnp.asarray(img))
    for i, (o, r) in enumerate(zip(ours, ref)):
        np.testing.assert_allclose(
            np.asarray(o).transpose(0, 3, 1, 2), r.numpy(), atol=3e-4, err_msg=f"stage {i}"
        )
