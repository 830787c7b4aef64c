import cv2
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rot

from freepose_tpu.pipeline.pnp import epnp, reprojection_error

K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])


def _scene(n=40, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    world = rng.uniform(-0.1, 0.1, size=(n, 3))
    r = Rot.random(random_state=rng).as_matrix()
    t = np.array([0.05, -0.03, 0.6])
    cam = world @ r.T + t
    uv = cam @ K.T
    uv = uv[:, :2] / uv[:, 2:]
    uv = uv + rng.normal(scale=noise, size=uv.shape)
    pose = np.eye(4)
    pose[:3, :3] = r
    pose[:3, 3] = t
    return world.astype(np.float32), uv.astype(np.float32), pose


def _pose_errors(est, gt):
    rot_err = np.rad2deg(
        np.linalg.norm(Rot.from_matrix(est[:3, :3] @ gt[:3, :3].T).as_rotvec())
    )
    t_err = np.linalg.norm(est[:3, 3] - gt[:3, 3])
    return rot_err, t_err


def test_epnp_exact_correspondences():
    world, uv, gt = _scene()
    est = np.asarray(epnp(jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K, jnp.float32), jnp.ones(len(world), bool)))
    rot_err, t_err = _pose_errors(est, gt)
    assert rot_err < 0.1 and t_err < 1e-3


def test_epnp_noisy_matches_opencv_quality():
    world, uv, gt = _scene(noise=1.0, seed=1)
    est = np.asarray(epnp(jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K, jnp.float32), jnp.ones(len(world), bool)))
    _, rvec, tvec = cv2.solvePnP(world.astype(np.float64), uv.astype(np.float64), K, np.array([]), flags=cv2.SOLVEPNP_EPNP)
    cv_pose = np.eye(4)
    cv_pose[:3, :3] = cv2.Rodrigues(rvec)[0]
    cv_pose[:3, 3] = tvec.reshape(-1)
    ours_rot, ours_t = _pose_errors(est, gt)
    cv_rot, cv_t = _pose_errors(cv_pose, gt)
    # Must be in the same quality class as OpenCV EPnP (within 2x + slack).
    assert ours_rot < max(2 * cv_rot, 1.0), (ours_rot, cv_rot)
    assert ours_t < max(2 * cv_t, 0.01), (ours_t, cv_t)


def test_epnp_with_padding_mask():
    world, uv, gt = _scene(seed=2)
    # Pad with garbage rows, masked out.
    world_p = np.concatenate([world, np.full((10, 3), 99.0, np.float32)])
    uv_p = np.concatenate([uv, np.zeros((10, 2), np.float32)])
    mask = np.concatenate([np.ones(len(world), bool), np.zeros(10, bool)])
    est = np.asarray(epnp(jnp.asarray(world_p), jnp.asarray(uv_p), jnp.asarray(K, jnp.float32), jnp.asarray(mask)))
    rot_err, t_err = _pose_errors(est, gt)
    assert rot_err < 0.1 and t_err < 1e-3


def test_reprojection_error():
    world, uv, gt = _scene(seed=3)
    err_gt = float(reprojection_error(jnp.asarray(gt, jnp.float32), jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K, jnp.float32), jnp.ones(len(world), bool)))
    assert err_gt < 1e-2
    bad = gt.copy()
    bad[:3, 3] += 0.05
    err_bad = float(reprojection_error(jnp.asarray(bad, jnp.float32), jnp.asarray(world), jnp.asarray(uv), jnp.asarray(K, jnp.float32), jnp.ones(len(world), bool)))
    assert err_bad > err_gt + 1.0


def test_epnp_batch_matches_serial():
    """compute_pnp_batch (one vmapped dispatch per interval) must equal
    per-frame epnp."""
    from freepose_tpu.pipeline.tracking_refiner import _epnp_batch

    world, _, _ = _scene(seed=3)
    uvs, masks = [], []
    for s in range(4):
        _, uv, _ = _scene(seed=3)  # same world; re-noise per frame below
        rng = np.random.default_rng(s)
        uvs.append(uv + rng.normal(scale=0.5, size=uv.shape).astype(np.float32))
        m = np.ones(len(world), bool)
        m[rng.integers(0, len(world), size=5)] = False
        masks.append(m)
    uv_t = np.stack(uvs)
    mask_t = np.stack(masks)
    batch = np.asarray(_epnp_batch(
        jnp.asarray(world), jnp.asarray(uv_t), jnp.asarray(K, jnp.float32), jnp.asarray(mask_t)
    ))
    assert batch.shape == (4, 4, 4)
    for i in range(4):
        solo = np.asarray(epnp(
            jnp.asarray(world), jnp.asarray(uv_t[i]), jnp.asarray(K, jnp.float32), jnp.asarray(mask_t[i])
        ))
        np.testing.assert_allclose(batch[i], solo, atol=1e-4)
