"""ZoeDepth (BEiT + DPT + metric bins): numerical parity with HF transformers.

The HF ZoeDepthForDepthEstimation at a tiny random-init config is the oracle
(same pattern as the DINOv2/CLIP/SAM2 parity tests); reference obtains ZoeD_N
from torch.hub (scripts/generate_depth_zoe.py:14)."""
import numpy as np
import pytest

from freepose_tpu.models.zoedepth import DEPTH_TEST, MetricDepthEstimator, ZoeDepthModel


def test_random_init_shapes():
    est = MetricDepthEstimator(DEPTH_TEST)
    rng = np.random.default_rng(0)
    img = (rng.random((48, 80, 3)) * 255).astype(np.uint8)
    depth = est.predict(img)
    assert depth.shape == (48, 80)
    assert np.isfinite(depth).all()
    assert (depth >= 0).all()


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import ZoeDepthConfig, ZoeDepthForDepthEstimation

    from freepose_tpu.models.convert import zoedepth_from_hf

    bc = dict(
        model_type="beit", hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, image_size=64, patch_size=16,
        use_relative_position_bias=True, out_features=["stage1", "stage2", "stage3", "stage4"],
        out_indices=[1, 2, 3, 4], reshape_hidden_states=False,
    )
    cfg = ZoeDepthConfig(
        backbone_config=bc, neck_hidden_sizes=[16, 24, 32, 40], fusion_hidden_size=32,
        num_attractors=[4, 4, 4, 4], bin_embedding_dim=8, bottleneck_features=32,
        num_relative_features=8,
    )
    torch.manual_seed(0)
    hf = ZoeDepthForDepthEstimation(cfg).eval()
    # Random-init lambda/table are zeros in HF init; randomize so the test
    # actually exercises layer scale + relative position bias.
    sd = hf.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if "lambda_" in k or "relative_position_bias_table" in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    hf.load_state_dict(sd)

    import dataclasses

    from freepose_tpu.models.beit import BeitConfig

    cfg_j = dataclasses.replace(
        DEPTH_TEST,
        beit=BeitConfig(hidden_size=32, num_layers=4, num_heads=4, intermediate_size=64,
                        patch_size=16, image_size=64, out_indices=(1, 2, 3, 4)),
        n_bins=64,
    )
    params = zoedepth_from_hf(hf.state_dict(), num_layers=4)
    return hf, ZoeDepthModel(cfg_j), params


def test_hf_parity_full_depth(hf_pair):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    hf, model, params = hf_pair
    rng = np.random.default_rng(2)
    pixels = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        want = hf(torch.tensor(pixels)).predicted_depth.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(pixels)))
    assert got.shape == want.shape == (2, 64, 64)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_hf_parity_backbone_taps(hf_pair):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from freepose_tpu.models.beit import BEIT_TEST, BeitBackbone

    hf, _, params = hf_pair
    rng = np.random.default_rng(3)
    pixels = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = hf.backbone(torch.tensor(pixels)).feature_maps

    taps, window = BeitBackbone(BEIT_TEST).apply(
        {"params": params["backbone"]}, jnp.asarray(pixels)
    )
    assert window == (4, 4)
    for got_t, want_t in zip(taps, want):
        np.testing.assert_allclose(
            np.asarray(got_t), want_t.numpy(), atol=1e-5, rtol=1e-4
        )


def test_hf_parity_backbone_nonpretrain_resolution(hf_pair):
    """Relative-position-bias table interpolation (MiDaS 3.1 arbitrary
    windows, HF modeling_beit.py:598-631): parity at 64x80 with a 64x64
    pretrain window."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from freepose_tpu.models.beit import BEIT_TEST, BeitBackbone

    hf, _, params = hf_pair
    rng = np.random.default_rng(4)
    pixels = rng.normal(size=(1, 3, 64, 80)).astype(np.float32)
    with torch.no_grad():
        want = hf.backbone(torch.tensor(pixels)).feature_maps

    taps, window = BeitBackbone(BEIT_TEST).apply(
        {"params": params["backbone"]}, jnp.asarray(pixels)
    )
    assert window == (4, 5)
    for got_t, want_t in zip(taps, want):
        np.testing.assert_allclose(
            np.asarray(got_t), want_t.numpy(), atol=2e-5, rtol=1e-4
        )


def test_predict_nonsquare_input_hw():
    est = MetricDepthEstimator(DEPTH_TEST)
    rng = np.random.default_rng(5)
    img = (rng.random((48, 80, 3)) * 255).astype(np.uint8)
    d = est.predict(img, input_hw=(64, 80))  # 4x5 window vs 4x4 pretrain
    assert d.shape == (48, 80) and np.isfinite(d).all() and (d >= 0).all()
    with pytest.raises(ValueError):
        est.predict(img, input_hw=(60, 80))  # not a patch multiple
