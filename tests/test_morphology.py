import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from freepose_tpu.ops.connected_components import (
    component_areas,
    connected_components_batch,
    label_components,
    largest_component,
    remove_small_components,
)
from freepose_tpu.ops.erosion import adaptive_erosion, isotropic_erosion


def _random_blobs(seed=0, shape=(48, 64), thresh=0.75):
    rng = np.random.default_rng(seed)
    img = ndimage.gaussian_filter(rng.random(shape), 3)
    return img > np.quantile(img, thresh)


def test_label_components_matches_scipy():
    mask = _random_blobs()
    ours = np.asarray(label_components(jnp.asarray(mask)))
    ref, n_ref = ndimage.label(mask, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    # Same partition: our labels and scipy labels must be in bijection.
    assert (ours >= 0).sum() == (ref > 0).sum()
    pairs = set(zip(ours[mask].tolist(), ref[mask].tolist()))
    assert len(pairs) == n_ref  # one of ours per scipy component
    assert len({p[0] for p in pairs}) == n_ref
    assert len({p[1] for p in pairs}) == n_ref


def test_component_areas():
    mask = np.zeros((20, 20), bool)
    mask[2:5, 2:5] = True  # 9 px
    mask[10:18, 10:18] = True  # 64 px
    labels = label_components(jnp.asarray(mask))
    areas = np.asarray(component_areas(labels))
    assert areas[3, 3] == 9
    assert areas[12, 12] == 64
    assert areas[0, 0] == 0


def test_largest_component_matches_scipy():
    mask = _random_blobs(seed=3)
    ours = np.asarray(largest_component(jnp.asarray(mask)))
    ref, n = ndimage.label(mask, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    sizes = ndimage.sum(mask, ref, range(1, n + 1))
    ref_mask = ref == (1 + int(np.argmax(sizes)))
    np.testing.assert_array_equal(ours, ref_mask)


def test_snake_component_converges():
    # A long serpentine: worst case for naive propagation; pointer jumping
    # must still converge.
    mask = np.zeros((30, 30), bool)
    for i in range(0, 30, 2):
        mask[i, :] = True
        if (i // 2) % 2 == 0:
            mask[i + 1 if i + 1 < 30 else i, -1] = True
        else:
            mask[i + 1 if i + 1 < 30 else i, 0] = True
    labels = np.asarray(label_components(jnp.asarray(mask)))
    ref, n = ndimage.label(mask, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    assert len(np.unique(labels[mask])) == n


def test_remove_small_components_and_fill_holes():
    mask = np.zeros((40, 40), bool)
    mask[5:25, 5:25] = True
    mask[10:12, 10:12] = False  # small hole (4 px)
    mask[30:32, 30:32] = True  # small sprinkle (4 px)
    out = np.asarray(remove_small_components(jnp.asarray(mask), max_area=8))
    assert out[10, 10]  # hole filled
    assert not out[30, 30]  # sprinkle removed
    assert out[6, 6]


def test_connected_components_batch():
    masks = np.stack([_random_blobs(seed=s) for s in range(3)])
    labels, areas = connected_components_batch(jnp.asarray(masks))
    assert labels.shape == masks.shape and areas.shape == masks.shape
    for i in range(3):
        ref, n = ndimage.label(masks[i], structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
        assert len(np.unique(np.asarray(labels[i])[masks[i]])) == n


def test_isotropic_erosion_matches_scipy_disk():
    mask = np.zeros((30, 30), bool)
    mask[5:25, 8:28] = True
    for r in (1, 3, 5):
        ours = np.asarray(isotropic_erosion(jnp.asarray(mask), r))
        # scipy equivalent: erosion by exact euclidean disk via EDT threshold.
        edt = ndimage.distance_transform_edt(mask)
        ref = edt > r
        np.testing.assert_array_equal(ours, ref)


def test_adaptive_erosion_ladder():
    # Small blob: radius 8 would kill it; ladder must fall back.
    mask = np.zeros((40, 40), bool)
    mask[10:22, 10:22] = True  # 12x12: r=8 leaves nothing, r=4 leaves 4x4=16<25, r=2 leaves 8x8=64
    out = np.asarray(adaptive_erosion(jnp.asarray(mask), radius=8, min_pixels=25))
    edt = ndimage.distance_transform_edt(mask)
    np.testing.assert_array_equal(out, edt > 2)
    # Tiny blob: even r=1 too much -> original mask returned.
    tiny = np.zeros((40, 40), bool)
    tiny[5:10, 5:10] = True
    out2 = np.asarray(adaptive_erosion(jnp.asarray(tiny), radius=8, min_pixels=25))
    np.testing.assert_array_equal(out2, tiny)
