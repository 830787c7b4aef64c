"""Native C++ connected components: parity vs the TPU device kernel."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from freepose_tpu.ops import cc_native
from freepose_tpu.ops.connected_components import (
    connected_components_batch as device_cc,
    largest_component as device_largest,
    remove_small_components as device_remove,
)

pytestmark = pytest.mark.skipif(not cc_native.available(), reason="no C++ toolchain")


def _blobs(seed, shape=(40, 56), thresh=0.72):
    rng = np.random.default_rng(seed)
    img = ndimage.gaussian_filter(rng.random(shape), 3)
    return img > np.quantile(img, thresh)


def test_native_matches_device_kernel():
    masks = np.stack([_blobs(s) for s in range(3)])
    n_labels, n_areas = cc_native.connected_components_batch(masks)
    d_labels, d_areas = device_cc(jnp.asarray(masks))
    np.testing.assert_array_equal(n_labels, np.asarray(d_labels))
    np.testing.assert_array_equal(n_areas, np.asarray(d_areas))


def test_native_largest_component():
    mask = _blobs(7)
    ours = cc_native.largest_component(mask)
    np.testing.assert_array_equal(ours, np.asarray(device_largest(jnp.asarray(mask))))


def test_native_remove_small_matches_device():
    mask = np.zeros((40, 40), bool)
    mask[5:25, 5:25] = True
    mask[10:12, 10:12] = False
    mask[30:32, 30:32] = True
    ours = cc_native.remove_small_components(mask[None], max_area=8)[0]
    ref = np.asarray(device_remove(jnp.asarray(mask), max_area=8))
    np.testing.assert_array_equal(ours, ref)
