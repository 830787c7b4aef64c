import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rot

from freepose_tpu.evaluation import pose_error as pe
from freepose_tpu.evaluation.score import (
    EstimateErrors,
    average_recall,
    bop19_average_recalls,
    match_poses,
)
from freepose_tpu.io.mesh import TriMesh

K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])


def _pts(n=200, seed=0):
    return np.random.default_rng(seed).uniform(-0.05, 0.05, (n, 3)).astype(np.float32)


def test_identical_pose_zero_errors():
    pts = _pts()
    r = Rot.random(random_state=1).as_matrix()
    t = np.array([0.0, 0, 0.5])
    assert pe.chamfer(r, t, r, t, pts, pts) < 1e-6
    assert pe.chamfer_proj(r, t, r, t, K, pts, pts) < 1e-3
    assert pe.add(r, t, r, t, pts) < 1e-7
    assert pe.adi(r, t, r, t, pts) < 1e-6
    assert pe.re(r, r) < 1e-3
    assert pe.te(t, t) == 0.0
    assert pe.proj(r, t, r, t, K, pts) < 1e-3
    assert pe.mssd(r, t, r, t, pts, pts) < 1e-6
    assert pe.mspd(r, t, r, t, K, pts, pts) < 1e-3


def test_chamfer_matches_sklearn_style_reference():
    pts_a = _pts(seed=1)
    pts_b = _pts(150, seed=2)
    r1 = Rot.random(random_state=3).as_matrix()
    r2 = Rot.random(random_state=4).as_matrix()
    t1, t2 = np.array([0.0, 0, 0.5]), np.array([0.01, 0, 0.52])
    got = pe.chamfer(r1, t1, r2, t2, pts_a, pts_b)
    # Reference formula via scipy cKDTree:
    from scipy.spatial import cKDTree

    a = pts_a @ r1.T + t1
    b = pts_b @ r2.T + t2
    d1 = cKDTree(a).query(b)[0].mean()
    d2 = cKDTree(b).query(a)[0].mean()
    assert abs(got - (d1 + d2)) < 1e-5


def test_translation_shift_error_scales():
    pts = _pts()
    r = np.eye(3)
    t1 = np.array([0.0, 0, 0.5])
    t2 = t1 + [0.02, 0, 0]
    assert abs(pe.add(r, t1, r, t2, pts) - 0.02) < 1e-6
    assert abs(pe.te(t1, t2) - 0.02) < 1e-9
    assert abs(pe.chamfer(r, t1, r, t2, pts, pts) - 0.04) < 0.02  # bi-directional


def test_adi_symmetric_invariance():
    # A ring of points: rotation about its axis leaves adi ~ 0, add > 0.
    ang = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    ring = np.stack([np.cos(ang) * 0.05, np.sin(ang) * 0.05, np.zeros_like(ang)], 1)
    r_gt = np.eye(3)
    r_est = Rot.from_rotvec([0, 0, np.pi / 7]).as_matrix()
    t = np.array([0.0, 0, 0.5])
    assert pe.adi(r_est, t, r_gt, t, ring) < 1e-3  # bounded by ring sampling gap
    assert pe.add(r_est, t, r_gt, t, ring) > 0.01


def test_mssd_symmetry_aware():
    pts = _pts()
    r_gt = np.eye(3)
    sym = {"R": Rot.from_rotvec([0, 0, np.pi]).as_matrix(), "t": np.zeros(3)}
    r_est = sym["R"]
    t = np.array([0.0, 0, 0.5])
    e_nosym = pe.mssd(r_est, t, r_gt, t, pts, pts)
    e_sym = pe.mssd(r_est, t, r_gt, t, pts, pts, syms=[{"R": np.eye(3), "t": np.zeros(3)}, sym])
    assert e_sym < 1e-6 < e_nosym


def test_cus_with_tpu_renderer():
    # Cube silhouettes: identical poses -> 0; disjoint -> 1.
    h = 0.05
    v = np.array([[-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
                  [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
                  [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]], np.int32)
    mesh = TriMesh(v, f)
    ren = pe.MaskRenderer(160, 128, max_vertices=16, max_faces=16)
    ren.add_object("a", mesh)
    k = np.array([[150.0, 0, 80], [0, 150, 64], [0, 0, 1]])
    r = np.eye(3)
    t = np.array([0.0, 0, 0.6])
    assert pe.cus(r, t, r, t, k, ren, "a", "a") < 1e-6
    t2 = np.array([0.25, 0, 0.6])  # far to the side
    assert pe.cus(r, t, r, t2, k, ren, "a", "a") > 0.95


def _np_vsd_oracle(depth_test, depth_gt, depth_est, k, delta, taus, diameter,
                   cost_type="step", normalized=True):
    """Numpy oracle coded directly against the VSD spec (Hodan et al. ECCV'18,
    bop19 visibility): distance images, visibility masks, per-tau costs."""
    h, w = depth_test.shape
    xs = (np.arange(w) - k[0, 2]) / k[0, 0]
    ys = (np.arange(h) - k[1, 2]) / k[1, 1]
    scale = np.sqrt(xs[None, :] ** 2 + ys[:, None] ** 2 + 1.0)
    d_test, d_gt, d_est = (d * scale for d in (depth_test, depth_gt, depth_est))

    def visib(d_model):
        return np.logical_and(
            np.logical_or(d_model - d_test <= delta, d_test == 0), d_model > 0
        )

    v_gt = visib(d_gt)
    v_est = np.logical_or(visib(d_est), np.logical_and(v_gt, d_est > 0))
    inter, union = v_gt & v_est, v_gt | v_est
    if union.sum() == 0:
        return [1.0] * len(taus)
    dists = np.abs(d_gt[inter] - d_est[inter])
    if normalized:
        dists = dists / diameter
    comp = union.sum() - inter.sum()
    out = []
    for tau in taus:
        costs = (dists >= tau) if cost_type == "step" else np.minimum(dists / tau, 1.0)
        out.append((costs.sum() + comp) / union.sum())
    return out


def test_vsd_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    h, w = 48, 64
    k = np.array([[80.0, 0, 32], [0, 80, 24], [0, 0, 1]])
    # Synthetic depths: overlapping blobs + missing-depth pixels in the scene.
    depth_gt = np.zeros((h, w), np.float32)
    depth_gt[10:30, 15:40] = 0.6
    depth_est = np.zeros((h, w), np.float32)
    depth_est[12:32, 20:45] = 0.62
    depth_test = depth_gt + rng.normal(0, 0.002, (h, w)).astype(np.float32)
    depth_test[depth_gt == 0] = 0.9  # background surface
    depth_test[5:8, :] = 0.0  # sensor holes

    taus = (0.01, 0.05, 0.2)
    for cost in ("step", "tlinear"):
        oracle = _np_vsd_oracle(depth_test, depth_gt, depth_est, k, 0.015, taus,
                                diameter=0.1, cost_type=cost)
        import jax.numpy as jnp

        got = pe._vsd_jit(
            jnp.asarray(depth_test), jnp.asarray(depth_gt), jnp.asarray(depth_est),
            jnp.asarray(k, jnp.float32), 0.015, 0.1, taus, cost, True,
        )
        np.testing.assert_allclose(np.asarray(got), oracle, atol=2e-4)


def test_vsd_end_to_end_with_renderer():
    h = 0.05
    v = np.array([[-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
                  [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
                  [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]], np.int32)
    ren = pe.MaskRenderer(160, 128, max_vertices=16, max_faces=16)
    ren.add_object("a", TriMesh(v, f))
    k = np.array([[150.0, 0, 80], [0, 150, 64], [0, 0, 1]])
    r, t = np.eye(3), np.array([0.0, 0, 0.6])
    depth_test = ren.render_depth("a", r, t, k)

    # Perfect estimate: all errors 0 at every tau.
    errs = pe.vsd(r, t, r, t, depth_test, k, delta=0.015, taus=[0.05, 0.2, 0.5],
                  normalized_by_diameter=True, diameter=2 * h * np.sqrt(3),
                  renderer=ren, inf_id="a", gt_id="a")
    assert all(e < 1e-6 for e in errs)

    # Shifted estimate: error decreases with growing tolerance tau.
    t2 = t + [0.02, 0, 0]
    errs2 = pe.vsd(r, t2, r, t, depth_test, k, delta=0.015, taus=[0.05, 0.2, 0.5],
                   normalized_by_diameter=True, diameter=2 * h * np.sqrt(3),
                   renderer=ren, inf_id="a", gt_id="a")
    assert errs2[0] >= errs2[1] >= errs2[2]
    assert errs2[0] > 0.1


def test_matching_and_recall():
    # 2 GTs; est0 (high score) matches gt0 well, est1 matches gt1 at 0.3.
    frame = [
        EstimateErrors(1, 1, "m", 0.9, {0: 0.1, 1: 0.4}),
        EstimateErrors(1, 1, "m", 0.5, {0: 0.2, 1: 0.3}),
    ]
    matches, n = match_poses(frame, threshold=0.35, n_gts=2)
    assert set(matches) == {(0, 0), (1, 1)}
    per_frame = [(frame, 2)]
    assert average_recall(per_frame, np.array([0.35])) == 1.0
    assert average_recall(per_frame, np.array([0.15])) == 0.5
    out = bop19_average_recalls({"chamfer": per_frame})
    assert 0 < out["AR_chamfer"] <= 1.0 and out["AR"] == out["AR_chamfer"]


def test_symmetry_transformations():
    from scipy.spatial.transform import Rotation as R

    from freepose_tpu.evaluation.symmetry import get_symmetry_transformations

    # No symmetry: identity only.
    syms = get_symmetry_transformations({})
    assert len(syms) == 1
    np.testing.assert_allclose(syms[0]["R"], np.eye(3))

    # Discrete z-flip (4x4 flattened).
    flip = np.eye(4)
    flip[:3, :3] = R.from_rotvec([0, 0, np.pi]).as_matrix()
    syms = get_symmetry_transformations({"symmetries_discrete": [flip.reshape(-1).tolist()]})
    assert len(syms) == 2
    np.testing.assert_allclose(syms[1]["R"], flip[:3, :3], atol=1e-12)

    # Continuous z-axis with offset: step count = ceil(pi / step); every
    # element maps the offset point to itself (t = -R@o + o).
    info = {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [1.0, 2.0, 3.0]}]}
    syms = get_symmetry_transformations(info, max_sym_disc_step=0.5)
    assert len(syms) == int(np.ceil(np.pi / 0.5))
    o = np.array([[1.0], [2.0], [3.0]])
    for s in syms:
        np.testing.assert_allclose(s["R"] @ o + s["t"], o, atol=1e-12)
        # Rotation really is about z.
        np.testing.assert_allclose(s["R"] @ np.array([0.0, 0, 1]), [0, 0, 1], atol=1e-12)

    # Combined: discrete x continuous composes (reference misc.py:80-89).
    info["symmetries_discrete"] = [flip.reshape(-1).tolist()]
    both = get_symmetry_transformations(info, max_sym_disc_step=0.5)
    assert len(both) == 2 * len(syms)

    # mssd with the continuous set: rotation about z scores ~0 on a z-ring.
    ang = np.linspace(0, 2 * np.pi, 256, endpoint=False)
    ring = np.stack([np.cos(ang) * 0.05, np.sin(ang) * 0.05, np.zeros_like(ang)], 1)
    syms_fine = get_symmetry_transformations(
        {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}, 0.05
    )
    r_est = R.from_rotvec([0, 0, 0.8]).as_matrix()
    t = np.array([0.0, 0, 0.5])
    syms_fmt = [{"R": s["R"], "t": s["t"].reshape(3)} for s in syms_fine]
    assert pe.mssd(r_est, t, np.eye(3), t, ring, ring, syms=syms_fmt) < 5e-3


def test_cou_mask():
    a = np.zeros((8, 8), bool)
    a[2:6, 2:6] = True
    assert pe.cou_mask(a, a) == 0.0
    b = np.zeros((8, 8), bool)
    b[0:2, 0:2] = True
    assert pe.cou_mask(a, b) == 1.0
    assert pe.cou_mask(a, np.zeros((8, 8), bool)) == 1.0  # empty union
    c = np.zeros((8, 8), bool)
    c[2:6, 2:4] = True  # half of a
    assert abs(pe.cou_mask(a, c) - 0.5) < 1e-9


def test_cou_bb_proj_with_tpu_renderer():
    h = 0.05
    v = np.array([[-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
                  [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
                  [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]], np.int32)
    ren = pe.MaskRenderer(160, 128, max_vertices=16, max_faces=16)
    ren.add_object("a", TriMesh(v, f))
    k = np.array([[150.0, 0, 80], [0, 150, 64], [0, 0, 1]])
    r = np.eye(3)
    t = np.array([0.0, 0, 0.6])
    assert pe.cou_bb_proj(r, t, r, t, k, ren, "a") < 1e-6
    t2 = np.array([0.25, 0, 0.6])
    assert pe.cou_bb_proj(r, t, r, t2, k, ren, "a") > 0.9
    # Behind the camera -> empty render -> defensive 1.0.
    t3 = np.array([0.0, 0, -0.6])
    assert pe.cou_bb_proj(r, t, r, t3, k, ren, "a") == 1.0
