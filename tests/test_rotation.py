import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rot

from freepose_tpu.geometry import rotation as R


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    m = R.quat_to_matrix(jnp.asarray(q))
    m_ref = Rot.from_quat(q).as_matrix()
    np.testing.assert_allclose(np.asarray(m), m_ref, atol=1e-5)
    q_back = np.asarray(R.matrix_to_quat(m))
    # Quaternions are double covers: compare up to sign.
    dots = np.abs(np.sum(q_back * q, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_super_fibonacci_matches_reference_formula():
    # Independently recompute the reference's sampling loop
    # (pose_estimator.py:121-147) in numpy and compare.
    n = 600
    phi = np.sqrt(2.0)
    psi = 1.533751168755204288118041
    s = np.arange(n) + 0.5
    r = np.sqrt(s / n)
    big = np.sqrt(1.0 - s / n)
    alpha = 2.0 * np.pi * s / phi
    beta = 2.0 * np.pi * s / psi
    q_ref = np.stack([r * np.sin(alpha), r * np.cos(alpha), big * np.sin(beta), big * np.cos(beta)], -1)
    q = np.asarray(R.super_fibonacci_quats(n))
    np.testing.assert_allclose(q, q_ref, atol=2e-4)
    m = np.asarray(R.super_fibonacci_rotations(n))
    m_ref = Rot.from_quat(q_ref).as_matrix()
    np.testing.assert_allclose(m, m_ref, atol=5e-4)


def test_template_poses():
    poses = np.asarray(R.template_poses(16, z=1.1))
    assert poses.shape == (16, 4, 4)
    np.testing.assert_allclose(poses[:, 3], np.tile([0, 0, 0, 1], (16, 1)), atol=1e-7)
    np.testing.assert_allclose(poses[:, 2, 3], 1.1, atol=1e-7)
    np.testing.assert_allclose(poses[:, 0, 3], 0.0, atol=1e-7)


def test_geodesic_distance_against_scipy():
    rng = np.random.default_rng(1)
    rots = Rot.random(128, random_state=rng).as_matrix().astype(np.float32)
    ref = Rot.random(1, random_state=rng).as_matrix()[0].astype(np.float32)
    d = np.asarray(R.geodesic_distance(jnp.asarray(rots), jnp.asarray(ref)))
    diffs = rots @ ref.T
    d_ref = np.rad2deg(np.linalg.norm(Rot.from_matrix(diffs).as_rotvec(), axis=1))
    np.testing.assert_allclose(d, d_ref, atol=0.05)


def test_average_quaternions_recovers_mean():
    rng = np.random.default_rng(2)
    base = Rot.random(1, random_state=rng)
    # Small perturbations around a base rotation: the eigen-average must stay
    # within the perturbation ball of the base.
    perturbs = Rot.from_rotvec(rng.normal(scale=0.05, size=(32, 3)))
    quats = (base * perturbs).as_quat()
    avg = np.asarray(R.average_quaternions(jnp.asarray(quats, dtype=jnp.float32)))
    ang = 2 * np.arccos(np.clip(np.abs(np.sum(avg * base.as_quat()[0])), -1, 1))
    assert ang < 0.1


def test_rotvec_roundtrip():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    m = R.rotvec_to_matrix(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(m), Rot.from_rotvec(v).as_matrix(), atol=1e-5)
    v_back = np.asarray(R.matrix_to_rotvec(m))
    v_ref = Rot.from_matrix(np.asarray(m)).as_rotvec()
    np.testing.assert_allclose(v_back, v_ref, atol=2e-3)


@pytest.mark.parametrize("theta", [1e-8, np.pi - 1e-4, np.pi])
def test_rotvec_edge_cases(theta):
    axis = np.array([1.0, 0.0, 0.0])
    m = Rot.from_rotvec(axis * theta).as_matrix().astype(np.float32)
    v = np.asarray(R.matrix_to_rotvec(jnp.asarray(m)))
    assert abs(np.linalg.norm(v) - theta) < 1e-3
