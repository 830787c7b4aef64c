"""EPnP: pose from 2D-3D correspondences, fully on device.

Replaces the reference's cv2.solvePnP(..., flags=SOLVEPNP_EPNP) call
(reference src/pipeline/estimators/tracking_refiner.py:168-179) with a
jit-compiled EPnP (Lepetit et al., IJCV 2009): 4 PCA control points,
barycentric expansion, null-space of the 2N×12 projection system via eigh,
scale/sign fix, and a Kabsch solve for the rigid transform. Correspondences
arrive padded with a validity mask (static shapes), so per-interval PnP for
a whole track batch can vmap.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.sum(x * mask[:, None], axis=0) / jnp.maximum(jnp.sum(mask), 1.0)


def _kabsch(src: jax.Array, dst: jax.Array, mask: jax.Array):
    """Rigid transform aligning masked src -> dst (no scaling)."""
    mu_s = _masked_mean(src, mask)
    mu_d = _masked_mean(dst, mask)
    s = (src - mu_s) * mask[:, None]
    d = (dst - mu_d) * mask[:, None]
    h = s.T @ d
    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(vt.T @ u.T)
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(det)
    r = vt.T @ diag @ u.T
    t = mu_d - r @ mu_s
    return r, t


@partial(jax.jit, static_argnames=())
def epnp(
    world_pts: jax.Array,  # [N, 3] (padded)
    image_pts: jax.Array,  # [N, 2] pixel coords (padded)
    k: jax.Array,  # [3, 3]
    mask: jax.Array,  # [N] bool valid correspondences (>= 4 true)
) -> jax.Array:
    """-> [4, 4] camera-from-world pose."""
    n = world_pts.shape[0]
    m = mask.astype(jnp.float32)
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]

    # --- Control points: centroid + principal axes ---------------------- #
    c0 = _masked_mean(world_pts, m)
    centered = (world_pts - c0) * m[:, None]
    cov = centered.T @ centered / jnp.maximum(jnp.sum(m), 1.0)
    eigval, eigvec = jnp.linalg.eigh(cov)
    # Guard degenerate (planar) clouds with a small floor.
    axes = eigvec * jnp.sqrt(jnp.maximum(eigval, 1e-10))[None, :]
    ctrl_w = jnp.stack([c0, c0 + axes[:, 0], c0 + axes[:, 1], c0 + axes[:, 2]])  # [4, 3]

    # --- Barycentric coordinates ---------------------------------------- #
    a_mat = (ctrl_w[1:] - ctrl_w[0]).T  # [3, 3]
    a123 = jnp.linalg.solve(a_mat, (world_pts - c0).T).T  # [N, 3]
    alphas = jnp.concatenate([1.0 - jnp.sum(a123, axis=1, keepdims=True), a123], axis=1)  # [N, 4]

    # --- Build M (2N x 12) in NORMALIZED image coordinates (entries O(1),
    # which keeps the fp32 eigen-solve well conditioned) ------------------ #
    xn = (image_pts[:, 0] - cx) / fx
    yn = (image_pts[:, 1] - cy) / fy
    zeros = jnp.zeros((n, 4))
    row_u = jnp.stack([alphas, zeros, -alphas * xn[:, None]], axis=2).reshape(n, 12)
    row_v = jnp.stack([zeros, alphas, -alphas * yn[:, None]], axis=2).reshape(n, 12)
    mm = jnp.concatenate([row_u * m[:, None], row_v * m[:, None]], axis=0)  # [2N, 12]

    mtm = mm.T @ mm
    _, vecs = jnp.linalg.eigh(mtm)
    basis = vecs[:, :4].T.reshape(4, 4, 3)  # 4 smallest null-space candidates

    # --- Betas: closed-form init on the smallest vector, then Gauss-Newton
    # over all 4 betas on the 6 control-point distance constraints
    # (Lepetit et al. §3.3; OpenCV's gauss_newton equivalent) ------------- #
    pair_i, pair_j = jnp.triu_indices(4, k=1)

    def pair_d2(c):  # squared distances of the 6 control-point pairs
        d = c[pair_i] - c[pair_j]
        return jnp.sum(d * d, axis=-1)

    dw2 = pair_d2(ctrl_w)
    v0 = basis[0]
    beta0 = jnp.sum(jnp.sqrt(dw2) * jnp.sqrt(pair_d2(v0) + 1e-12)) / jnp.maximum(
        jnp.sum(pair_d2(v0)), 1e-12
    )
    betas = jnp.array([beta0, 0.0, 0.0, 0.0])

    def gn_step(_, b):
        ctrl = jnp.einsum("k,kij->ij", b, basis)  # [4, 3]
        diff = ctrl[pair_i] - ctrl[pair_j]  # [6, 3]
        resid = jnp.sum(diff * diff, axis=-1) - dw2  # [6]
        vdiff = basis[:, pair_i] - basis[:, pair_j]  # [4, 6, 3]
        jac = 2.0 * jnp.einsum("pd,kpd->pk", diff, vdiff)  # [6, 4]
        jtj = jac.T @ jac + 1e-9 * jnp.eye(4)
        return b - jnp.linalg.solve(jtj, jac.T @ resid)

    betas = jax.lax.fori_loop(0, 10, gn_step, betas)

    ctrl_c = jnp.einsum("k,kij->ij", betas, basis)
    cam_pts = alphas @ ctrl_c  # [N, 3]
    mean_z = jnp.sum(cam_pts[:, 2] * m) / jnp.maximum(jnp.sum(m), 1.0)
    cam_pts = jnp.where(mean_z < 0, -cam_pts, cam_pts)

    r, t = _kabsch(world_pts, cam_pts, m)
    pose = jnp.eye(4)
    pose = pose.at[:3, :3].set(r)
    pose = pose.at[:3, 3].set(t)
    return pose


@jax.jit
def reprojection_error(pose: jax.Array, world_pts: jax.Array, image_pts: jax.Array, k: jax.Array, mask: jax.Array) -> jax.Array:
    cam = world_pts @ pose[:3, :3].T + pose[:3, 3]
    uvw = cam @ k.T
    uv = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 1e-9)
    err = jnp.linalg.norm(uv - image_pts, axis=-1)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
