"""PCA feature visualization (reference refiner_utils.py:63-89 show_feats)."""
import jax.numpy as jnp
import numpy as np

from freepose_tpu.utils.viz import feature_panel, nearest_upscale, pca_rgb


def _np_pca3(x: np.ndarray) -> np.ndarray:
    """Numpy oracle: project centered rows onto top-3 principal components."""
    xc = x - x.mean(0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    return xc @ vt[:3].T


def test_pca_rgb_matches_numpy_oracle_up_to_sign():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(8, 10, 32)).astype(np.float32)
    rgb = np.asarray(pca_rgb(jnp.asarray(feats)))
    assert rgb.shape == (8, 10, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1 + 1e-6

    oracle = _np_pca3(feats.reshape(-1, 32))
    ours_proj = rgb.reshape(-1, 3)
    # Each channel matches an oracle component up to sign + affine (the
    # min-max normalization): |corr| ~ 1 per column.
    for k in range(3):
        a = ours_proj[:, k] - ours_proj[:, k].mean()
        b = oracle[:, k] - oracle[:, k].mean()
        corr = abs(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert corr > 0.999


def test_pca_rgb_masked_fit_and_black_background():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(6, 6, 16)).astype(np.float32)
    mask = np.zeros((6, 6), bool)
    mask[1:5, 2:5] = True
    rgb = np.asarray(pca_rgb(jnp.asarray(feats), jnp.asarray(mask)))
    # Masked-out pixels are black (reference refiner_utils.py:84).
    assert (rgb[~mask] == 0).all()
    assert rgb[mask].max() > 0


def test_nearest_upscale_replicates_pixels():
    img = np.arange(6).reshape(2, 3, 1)
    up = nearest_upscale(img, 2)
    assert up.shape == (4, 6, 1)
    assert (up[0:2, 0:2, 0] == 0).all() and (up[2:4, 4:6, 0] == 5).all()


def test_feature_panel_layout():
    rng = np.random.default_rng(2)
    h, w, patch = 4, 5, 14
    feats = rng.normal(size=(h, w, 8)).astype(np.float32)
    image = (rng.random((h * patch, w * patch, 3)) * 255).astype(np.uint8)
    mask = rng.random((h, w)) > 0.5

    panel = feature_panel(image, feats, mask=mask, patch=patch)
    assert panel.dtype == np.uint8
    # image | feats | mask | masked feats -> 4 tiles wide.
    assert panel.shape == (h * patch, 4 * w * patch, 3)

    no_mask = feature_panel(image, feats, patch=patch)
    assert no_mask.shape == (h * patch, 2 * w * patch, 3)
