import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.models.sam2.transforms import postprocess_masks, preprocess
from freepose_tpu.ops import cc_native


def test_preprocess_shape_and_normalization():
    img = (np.ones((30, 50, 3)) * 127).astype(np.uint8)
    out = np.asarray(preprocess(jnp.asarray(img), size=64))
    assert out.shape == (1, 3, 64, 64)
    # 127/255 ≈ 0.498 -> (0.498-0.485)/0.229 ≈ 0.057 on channel 0
    assert abs(out[0, 0, 0, 0] - (127 / 255 - 0.485) / 0.229) < 1e-3


def test_postprocess_fills_holes_and_removes_speckles():
    logits = np.full((1, 32, 32), -5.0, np.float32)
    logits[0, 4:20, 4:20] = 5.0
    logits[0, 10:12, 10:12] = -5.0  # small hole
    logits[0, 28:30, 28:30] = 5.0  # speckle
    masks = postprocess_masks(jnp.asarray(logits), (64, 64), fill_hole_area=8)
    assert masks.shape == (1, 64, 64)
    assert masks[0, 21, 21]  # hole filled (scaled 2x)
    assert not masks[0, 58, 58]  # speckle removed


@pytest.mark.skipif(not cc_native.available(), reason="no C++ toolchain")
def test_postprocess_native_matches_device():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 24, 24)).astype(np.float32)
    a = postprocess_masks(jnp.asarray(logits), (48, 48), fill_hole_area=4, use_native=False)
    b = postprocess_masks(jnp.asarray(logits), (48, 48), fill_hole_area=4, use_native=True)
    np.testing.assert_array_equal(a, b)
