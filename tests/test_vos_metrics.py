import numpy as np

from freepose_tpu.evaluation.vos_metrics import boundary_f_measure, jaccard, track_j_and_f


def _square(h=64, w=64, y0=10, x0=10, s=20):
    m = np.zeros((h, w), bool)
    m[y0:y0+s, x0:x0+s] = True
    return m


def test_jaccard():
    a = _square()
    assert jaccard(a, a) == 1.0
    assert jaccard(a, np.zeros_like(a)) == 0.0
    b = _square(x0=20)  # half overlap in x
    assert abs(jaccard(a, b) - (10 * 20) / (30 * 20)) < 1e-9
    assert jaccard(np.zeros_like(a), np.zeros_like(a)) == 1.0


def test_boundary_f():
    a = _square()
    assert boundary_f_measure(a, a) == 1.0
    # 1-px shift stays within the tolerance band.
    b = _square(x0=11)
    assert boundary_f_measure(a, b) > 0.95
    # Large shift: boundaries far apart.
    c = _square(x0=40)
    assert boundary_f_measure(a, c) < 0.3


def test_track_jf():
    gt = np.stack([_square(x0=10 + t) for t in range(5)])
    pred = np.stack([_square(x0=10 + t) for t in range(5)])
    out = track_j_and_f(pred, gt)
    assert out["J"] == 1.0 and out["F"] == 1.0 and out["J&F"] == 1.0
    noisy = np.stack([_square(x0=12 + t) for t in range(5)])
    out2 = track_j_and_f(noisy, gt)
    assert 0 < out2["J"] < 1.0
