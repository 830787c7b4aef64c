"""Rotation utilities: quaternions, SO(3) maps, super-Fibonacci sampling.

Quaternion convention is scalar-last ``[x, y, z, w]`` (matching scipy, which
the reference uses throughout, e.g. /root/reference/src/pipeline/retrieval/
renderer.py:30 and estimators/pose_estimator.py:140).

Everything is pure jax.numpy, batched, and jit-safe (static shapes, no Python
control flow on traced values), so pose grids of any size map onto the VPU and
the per-pose math fuses into surrounding kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Magic constants of super-Fibonacci spirals (Alexa, CVPR 2022), as used by the
# reference pose sampler (pose_estimator.py:123-124). Plain Python floats so
# importing this module never touches a JAX backend (the driver's multichip
# dryrun imports the package before selecting the CPU platform).
_PHI = 2.0 ** 0.5
_PSI = 1.533751168755204288118041


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """[..., 4] scalar-last quaternion -> [..., 3, 3] rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation matrix -> [..., 4] scalar-last quaternion.

    Branch-free Shepperd's method: compute all four candidate solutions and
    select by the largest denominator (jit-safe, numerically stable).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the max of (tr, m00, m11, m22).
    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    s_w = _safe_sqrt(1.0 + tr) * 2.0
    q_w = jnp.stack([(m21 - m12) / s_w, (m02 - m20) / s_w, (m10 - m01) / s_w, s_w / 4.0], -1)
    s_x = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q_x = jnp.stack([s_x / 4.0, (m01 + m10) / s_x, (m02 + m20) / s_x, (m21 - m12) / s_x], -1)
    s_y = _safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q_y = jnp.stack([(m01 + m10) / s_y, s_y / 4.0, (m12 + m21) / s_y, (m02 - m20) / s_y], -1)
    s_z = _safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q_z = jnp.stack([(m02 + m20) / s_z, (m12 + m21) / s_z, s_z / 4.0, (m10 - m01) / s_z], -1)

    cand = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # [..., 4, 4]
    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def super_fibonacci_quats(n: int) -> jax.Array:
    """Super-Fibonacci spiral sampling of SO(3) -> [n, 4] scalar-last quats.

    Deterministic low-discrepancy covering used for the 600-view coarse grid
    and 10k/20k fine grids (reference: pose_estimator.py:121-147). Computed
    host-side in float64 (an init-time constant; sin/cos of arguments in the
    thousands of radians need double precision) and shipped to device once.
    """
    import numpy as np

    s = np.arange(n, dtype=np.float64) + 0.5
    t = s / n
    r = np.sqrt(t)
    big_r = np.sqrt(1.0 - t)
    alpha = 2.0 * np.pi * s / float(_PHI)
    beta = 2.0 * np.pi * s / _PSI
    q = np.stack(
        [r * np.sin(alpha), r * np.cos(alpha), big_r * np.sin(beta), big_r * np.cos(beta)],
        axis=-1,
    )
    return jnp.asarray(q, dtype=jnp.float32)


def super_fibonacci_rotations(n: int) -> jax.Array:
    """[n, 3, 3] rotation matrices of the super-Fibonacci grid."""
    return quat_to_matrix(super_fibonacci_quats(n))


def template_poses(n: int, z: float = 1.1) -> jax.Array:
    """[n, 4, 4] camera-from-object template poses: super-Fibonacci rotation,
    object centred at (0, 0, z) (reference renderer.py:32-35)."""
    rots = super_fibonacci_rotations(n)
    poses = jnp.tile(jnp.eye(4), (n, 1, 1))
    poses = poses.at[:, :3, :3].set(rots)
    poses = poses.at[:, 2, 3].set(z)
    return poses


def geodesic_distance(rots: jax.Array, ref: jax.Array, degrees: bool = True) -> jax.Array:
    """Angle of relative rotation between [N, 3, 3] grid and [3, 3] reference.

    Replaces the reference's scipy rotvec-norm path
    (online_pose_estimator.py:25-34) with the closed-form trace identity
    (a single batched matmul + arccos — MXU-friendly for 20k-pose grids).
    """
    rel = jnp.einsum("nij,kj->nik", rots, ref)
    cos = (jnp.trace(rel, axis1=-2, axis2=-1) - 1.0) / 2.0
    ang = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    return jnp.rad2deg(ang) if degrees else ang


def average_quaternions(quats: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Markley eigen-average of [N, 4] quaternions -> [4].

    Principal eigenvector of the weighted outer-product sum (reference:
    refiner_utils.py:173-190), via jnp.linalg.eigh on the symmetric 4x4.
    """
    if weights is None:
        weights = jnp.ones(quats.shape[0], dtype=quats.dtype)
    a = jnp.einsum("n,ni,nj->ij", weights, quats, quats) / jnp.sum(weights)
    _, vecs = jnp.linalg.eigh(a)  # ascending eigenvalues
    return vecs[:, -1]


def rotvec_to_matrix(rotvec: jax.Array) -> jax.Array:
    """[..., 3] axis-angle -> [..., 3, 3] via Rodrigues, jit-safe at theta→0."""
    theta = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-12)
    axis = rotvec / safe
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    k = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], -1).reshape(rotvec.shape[:-1] + (3, 3))
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rotvec.dtype), k.shape)
    return eye + jnp.sin(th) * k + (1.0 - jnp.cos(th)) * (k @ k)


def matrix_to_rotvec(m: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 3] axis-angle (SO(3) log map), jit-safe."""
    cos = jnp.clip((jnp.trace(m, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    # Skew part (valid away from theta = pi); near pi fall back via quaternion.
    skew = jnp.stack(
        [m[..., 2, 1] - m[..., 1, 2], m[..., 0, 2] - m[..., 2, 0], m[..., 1, 0] - m[..., 0, 1]],
        axis=-1,
    )
    sin = jnp.sin(theta)
    scale = jnp.where(theta[..., None] < 1e-6, 0.5, theta[..., None] / jnp.maximum(2.0 * sin[..., None], 1e-12))
    generic = skew * scale
    # Near-pi branch via quaternion vector part.
    q = matrix_to_quat(m)
    sign_w = jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    v = q[..., :3] * sign_w
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    near_pi = v / jnp.maximum(vn, 1e-12) * theta[..., None]
    return jnp.where(theta[..., None] > jnp.pi - 1e-3, near_pi, generic)
