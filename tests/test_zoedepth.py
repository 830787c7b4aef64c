import numpy as np

from freepose_tpu.models.zoedepth import DEPTH_TEST, MetricDepthEstimator


def test_depth_prediction_shapes_and_range():
    est = MetricDepthEstimator(DEPTH_TEST)
    rng = np.random.default_rng(0)
    image = (rng.random((48, 80, 3)) * 255).astype(np.uint8)
    depth = est.predict(image)
    assert depth.shape == (48, 80)
    assert np.isfinite(depth).all()
    # Bin construction bounds depth to [min_depth, max_depth].
    assert depth.min() >= DEPTH_TEST.min_depth - 1e-5
    assert depth.max() <= DEPTH_TEST.max_depth + 1e-5


def test_depth_deterministic_and_input_sensitive():
    est = MetricDepthEstimator(DEPTH_TEST)
    rng = np.random.default_rng(1)
    a = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    b = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    np.testing.assert_allclose(est.predict(a), est.predict(a))
    assert np.abs(est.predict(a) - est.predict(b)).max() > 0
