"""SE(3) helpers and trajectory smoothing.

The reference smooths pose tracks with a moving average over translations
(window 5) and a Markley quaternion eigen-average over rotations (window 9)
(refiner_utils.py:193-221). Here both are single batched windowed ops: gather
the window for every frame at once (static window, edge-clamped with weights),
then vmap the averages — one fused XLA program instead of a Python loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from freepose_tpu.geometry.rotation import (
    average_quaternions,
    matrix_to_quat,
    matrix_to_rotvec,
    quat_to_matrix,
    rotvec_to_matrix,
)


def se3_inverse(t: jax.Array) -> jax.Array:
    """[..., 4, 4] rigid transform inverse."""
    r = t[..., :3, :3]
    p = t[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    inv = jnp.zeros_like(t)
    inv = inv.at[..., :3, :3].set(rt)
    inv = inv.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", rt, p))
    inv = inv.at[..., 3, 3].set(1.0)
    return inv


def make_se3(r: jax.Array, t: jax.Array) -> jax.Array:
    """[..., 3, 3] rotation + [..., 3] translation -> [..., 4, 4]."""
    out = jnp.zeros(r.shape[:-2] + (4, 4), dtype=r.dtype)
    out = out.at[..., :3, :3].set(r)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def so3_log(r: jax.Array) -> jax.Array:
    return matrix_to_rotvec(r)


def so3_exp(v: jax.Array) -> jax.Array:
    return rotvec_to_matrix(v)


def _window_indices_weights(n: int, window: int):
    """Edge-clamped moving-average windows: for each frame i, indices of the
    frames in [i-w//2, i+w//2] clipped to [0, n), with 0-weight duplicates so
    edge frames average over their shorter valid window (matching the
    reference's start/end clamping at refiner_utils.py:196-201)."""
    half = window // 2
    offs = jnp.arange(-half, half + 1)
    idx = jnp.arange(n)[:, None] + offs[None, :]
    valid = (idx >= 0) & (idx < n)
    idx = jnp.clip(idx, 0, n - 1)
    return idx, valid.astype(jnp.float32)


def smooth_translations(xyz: jax.Array, window: int = 5) -> jax.Array:
    """[N, 3] moving-average translation smoothing (edge-clamped)."""
    n = xyz.shape[0]
    idx, w = _window_indices_weights(n, window)
    gathered = xyz[idx]  # [N, W, 3]
    return jnp.sum(gathered * w[..., None], axis=1) / jnp.sum(w, axis=1, keepdims=True)


def smooth_quaternions(quats: jax.Array, window: int = 9) -> jax.Array:
    """[N, 4] windowed Markley quaternion averaging (edge-clamped)."""
    n = quats.shape[0]
    idx, w = _window_indices_weights(n, window)
    gathered = quats[idx]  # [N, W, 4]
    return jax.vmap(average_quaternions)(gathered, w)


def _window_weights_masked(b: int, window: int, n_valid: jax.Array):
    """Like _window_indices_weights but the valid range [0, n_valid) is a
    TRACED scalar: one compiled program (static bucket b) serves every track
    length. Rows >= n_valid are padding whose outputs are sliced off."""
    half = window // 2
    offs = jnp.arange(-half, half + 1)
    idx = jnp.arange(b)[:, None] + offs[None, :]
    valid = (idx >= 0) & (idx < n_valid)
    idx = jnp.clip(idx, 0, b - 1)
    return idx, valid.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("t_window", "r_window"))
def _smooth_transforms_jit(
    tcos: jax.Array, n_valid: jax.Array, t_window: int, r_window: int
) -> jax.Array:
    b = tcos.shape[0]
    xyz = tcos[:, :3, 3]
    idx_t, w_t = _window_weights_masked(b, t_window, n_valid)
    den = jnp.maximum(jnp.sum(w_t, axis=1, keepdims=True), 1e-12)
    xyz = jnp.sum(xyz[idx_t] * w_t[..., None], axis=1) / den
    quats = matrix_to_quat(tcos[:, :3, :3])
    idx_r, w_r = _window_weights_masked(b, r_window, n_valid)
    quats = jax.vmap(average_quaternions)(quats[idx_r], w_r)
    out = tcos
    out = out.at[:, :3, 3].set(xyz)
    out = out.at[:, :3, :3].set(quat_to_matrix(quats))
    return out


# Canonical static frame bucket shared by every per-video-length program
# (HBM staging, quantile threshold, smoothing) — one definition so staged
# buffers and compiled shapes can never drift apart.
from freepose_tpu.datasets.video import FRAME_BUCKET  # noqa: E402


def smooth_transforms(
    tcos: jax.Array, t_window: int = 5, r_window: int = 9, bucket: int | None = None
) -> jax.Array:
    """[N, 4, 4] SE(3) trajectory smoothing (reference refiner_utils.py:210-221).

    Runs as ONE jitted program at a static frame bucket (N padded up to a
    multiple of 128 with identity poses, window weights masked by the true
    length) so every video length <= the bucket reuses the same executable —
    the eager per-op path recompiled at every distinct track length, which on
    a remote-compile TPU session cost tens of seconds per new video length.

    `bucket` pins the padded length explicitly (callers with a staged HBM
    video pass its buffer length so a short warm-up prefix compiles the same
    program as the full pass); default = n rounded up to FRAME_BUCKET."""
    n = tcos.shape[0]
    b = bucket if bucket is not None else -(-max(n, 1) // FRAME_BUCKET) * FRAME_BUCKET
    if b < n:
        raise ValueError(f"smooth_transforms: bucket {b} < track length {n}")
    tcos = jnp.asarray(tcos, jnp.float32)
    if b > n:
        pad = jnp.tile(jnp.eye(4, dtype=tcos.dtype)[None], (b - n, 1, 1))
        tcos = jnp.concatenate([tcos, pad], axis=0)
    return _smooth_transforms_jit(tcos, jnp.int32(n), t_window, r_window)[:n]
