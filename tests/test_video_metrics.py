import numpy as np
from scipy.spatial.transform import Rotation as Rot

from freepose_tpu.evaluation import video_metrics as vm


def _track(n=30, seed=0, rot_speed=0.05):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    rots = Rot.from_rotvec(np.outer(np.arange(n) * rot_speed, axis)).as_matrix()
    ts = np.stack([0.1 * np.sin(np.arange(n) * 0.1), np.zeros(n), 2 + 0.01 * np.arange(n)], axis=1)
    return rots, ts


def test_perfect_track_zero_errors():
    rots, ts = _track()
    dts = vm.default_dts(30)
    assert vm.average_rot_errors_dt(rots, rots, dts) < 1e-6
    assert vm.average_depth_errors_dt(rots, ts, ts, 0.15, 0.15, dts) < 1e-6
    assert vm.average_proj_errors_dt(rots, ts, ts, 0.15, dts, 640, 480) < 1e-6


def test_rot_error_constant_offset_is_zero_drift():
    # A constant rotation offset between est and gt gives zero RELATIVE error:
    # log(R2 R1^T) is unchanged by right-multiplying both by a fixed offset.
    rots, ts = _track()
    off = Rot.from_rotvec([0.4, 0.2, -0.1]).as_matrix()
    est = np.einsum("nij,jk->nik", rots, off)
    dts = vm.default_dts(30)
    assert vm.average_rot_errors_dt(est, rots, dts) < 1e-6


def test_rot_error_detects_drift():
    rots, ts = _track(rot_speed=0.05)
    drifted, _ = _track(rot_speed=0.08)  # faster spin = drift
    dts = vm.default_dts(30)
    e = vm.average_rot_errors_dt(drifted, rots, dts)
    assert e > 0.01


def test_symmetry_sweep_forgives_axis_spin():
    # est spins around z faster than gt; with sym_axis=z the sweep should
    # absorb (almost all of) the discrepancy for each pair.
    n = 20
    gt = Rot.from_rotvec(np.outer(np.arange(n) * 0.02, [0, 0, 1])).as_matrix()
    est = Rot.from_rotvec(np.outer(np.arange(n) * 0.30, [0, 0, 1])).as_matrix()
    e_nosym = vm.rot_errors(est, gt, dt=3)
    e_sym = vm.rot_errors(est, gt, dt=3, sym_axis=np.array([0.0, 0, 1]), n_symmetries=101)
    assert e_sym.mean() < 0.05
    assert e_nosym.mean() > 0.5


def test_depth_errors_scale_normalization():
    rots, ts = _track()
    # Scaling the estimated translations AND est_scale by the same factor is
    # invariant.
    dts = vm.default_dts(30)
    e1 = vm.average_depth_errors_dt(rots, ts * 2.0, ts, 0.3, 0.15, dts)
    assert e1 < 1e-2


def test_align_object_origins_fixes_offset():
    rots, ts = _track()
    # Shift the object origin by a constant offset in the object frame.
    offset = np.array([0.05, -0.02, 0.03])
    ts_shifted = np.einsum("nij,j->ni", rots, offset) + ts
    # Aligning the shifted track back against the original must put the
    # origins back on the GT viewing rays (radial distance is intentionally
    # preserved — the metric is depth-ambiguous).
    fixed = vm.align_object_origins(rots, ts_shifted, ts, scale=0.5)
    dirs_fixed = fixed / np.linalg.norm(fixed, axis=-1, keepdims=True)
    dirs_gt = ts / np.linalg.norm(ts, axis=-1, keepdims=True)
    ang_fixed = np.arccos(np.clip(np.sum(dirs_fixed * dirs_gt, -1), -1, 1))
    dirs_shift = ts_shifted / np.linalg.norm(ts_shifted, axis=-1, keepdims=True)
    ang_shift = np.arccos(np.clip(np.sum(dirs_shift * dirs_gt, -1), -1, 1))
    assert ang_fixed.mean() < 0.3 * ang_shift.mean()


def test_proj_error_units():
    rots, ts = _track()
    est_t = ts + np.array([0.01, 0, 0])  # constant offset, no velocity error
    dts = vm.default_dts(30)
    e = vm.average_proj_errors_dt(rots, est_t, ts, 0.15, dts, 640, 480)
    assert e < 0.2  # % of diagonal; constant offsets mostly cancel


def test_default_dts():
    dts = vm.default_dts(80)
    assert dts[0] == 1 and dts[-1] == 40 and len(dts) <= 10
