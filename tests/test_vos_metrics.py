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


def test_sav_evaluator_video_layouts(tmp_path):
    """scripts.sav_evaluator: SA-V per-object and DAVIS id-coded layouts."""
    import numpy as np
    from PIL import Image

    from scripts.sav_evaluator import evaluate_video

    def save(path, arr):
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(arr.astype(np.uint8)).save(path)

    # SA-V layout: one object, pred misses frame 2 of 4 -> skip-ends J = 0.5.
    for t in range(4):
        m = np.zeros((16, 16), np.uint8)
        m[4:10, 4:10] = 255
        save(tmp_path / f"gt/v/000/{t:05d}.png", m)
        save(tmp_path / f"pred/v/000/{t:05d}.png", m * (t != 2))
    res = evaluate_video(tmp_path / "gt/v", tmp_path / "pred/v", skip_ends=True)
    assert res["J"] == 0.5 and res["n_objects"] == 1
    res_all = evaluate_video(tmp_path / "gt/v", tmp_path / "pred/v", skip_ends=False)
    assert res_all["J"] == 0.75

    # DAVIS layout: ids 1/2 in one PNG, perfect -> 1.0 with 2 objects.
    for t in range(3):
        m = np.zeros((16, 16), np.uint8)
        m[1:5, 1:5] = 1
        m[9:14, 9:14] = 2
        save(tmp_path / f"gt/w/{t:05d}.png", m)
        save(tmp_path / f"pred/w/{t:05d}.png", m)
    res2 = evaluate_video(tmp_path / "gt/w", tmp_path / "pred/w", skip_ends=True)
    assert res2["J&F"] == 1.0 and res2["n_objects"] == 2
