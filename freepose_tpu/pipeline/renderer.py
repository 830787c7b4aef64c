"""High-level template renderer: batched render + proposal extraction.

TPU-native counterpart of the reference MeshRenderer
(src/pipeline/retrieval/renderer.py:11-130): the same camera model (f=600,
420×420, cx=cy=res/2) and super-Fibonacci pose grid at z=1.1, but rendering
all poses in ONE jitted rasterizer call instead of a serial pyrender loop,
and extracting crop-resize-pad proposals on device in the same program.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.boxes import mask_to_bbox
from freepose_tpu.geometry.crop import crop_resize_pad
from freepose_tpu.geometry.rotation import template_poses
from freepose_tpu.io.mesh import TriMesh, pad_mesh
from freepose_tpu.ops.rasterizer import RasterSettings, render_meshes

TEMPLATE_FOCAL = 600.0
TEMPLATE_RES = 420
TEMPLATE_Z = 1.1
RENDERING_SCALE = 0.25  # meshes rendered at quarter scale (reference render_templates.py:61)
DEGENERATE_MASK_MIN_PX = 100  # fallback threshold (reference template.py:75-77)


def template_intrinsics(res: int = TEMPLATE_RES, f: float = TEMPLATE_FOCAL) -> jnp.ndarray:
    return jnp.array([[f, 0.0, res / 2], [0.0, f, res / 2], [0.0, 0.0, 1.0]], jnp.float32)


@dataclasses.dataclass
class TemplateRenderer:
    """Renders a mesh from the n-pose super-Fibonacci grid (or arbitrary
    poses) and extracts square proposals."""

    n_poses: int = 600
    resolution: int = TEMPLATE_RES
    max_vertices: int = 8192
    max_faces: int = 16384
    pose_chunk: int = 128
    settings: RasterSettings | None = None
    # "auto": per-pixel texture sampling when the mesh carries an atlas
    # (reference GL fidelity); "bake": always shade baked vertex colors.
    texture_mode: str = "auto"

    def __post_init__(self):
        if self.settings is None:
            self.settings = RasterSettings(resolution=self.resolution)
        self.poses = template_poses(self.n_poses, z=TEMPLATE_Z)
        # Focal length scales with resolution so any res keeps the reference
        # camera's FOV (f=600 at 420 px).
        f = TEMPLATE_FOCAL * self.resolution / TEMPLATE_RES
        self.k = template_intrinsics(self.resolution, f)

    def _padded(self, mesh: TriMesh, scale: float):
        v, c, f, valid = pad_mesh(mesh, self.max_vertices, self.max_faces)
        return jnp.asarray(v * scale), jnp.asarray(c), jnp.asarray(f), jnp.asarray(valid)

    def render(self, mesh: TriMesh, scale: float = RENDERING_SCALE):
        """Render the full template grid -> (rgb [N,R,R,3], depth [N,R,R])."""
        return self.render_from_poses(mesh, self.poses, scale=scale)

    def render_from_poses(self, mesh: TriMesh, poses: jax.Array, scale: float = RENDERING_SCALE):
        """Textured meshes sample their atlas per pixel (ops/texture.py — the
        reference's GL textured render, renderer.py:37-68) when texture_mode
        is "auto"; "bake" forces the per-vertex-color fallback."""
        if self.texture_mode == "auto" and mesh.texture is not None and mesh.uv is not None:
            from freepose_tpu.io.mesh import fit_to_budget, pad_uv
            from freepose_tpu.ops.texture import render_textured

            fitted = fit_to_budget(mesh, self.max_vertices, self.max_faces)
            v, c, f, valid = self._padded(fitted, scale)
            uvw = pad_uv(fitted, self.max_vertices)
            return render_textured(
                v, jnp.asarray(uvw), f, valid, poses, self.k,
                jnp.asarray(fitted.texture), self.settings,
                pose_chunk=self.pose_chunk,
            )
        v, c, f, valid = self._padded(mesh, scale)
        return render_meshes(v, c, f, valid, poses, self.k, self.settings, pose_chunk=self.pose_chunk)

    def generate_proposals(self, rgb: jax.Array, depth: jax.Array, target: int | None = None):
        """Crop each render around its mask bbox, like the reference's
        MeshRenderer.generate_proposals (renderer.py:109-130).

        Returns (proposals [N, 3, target, target], masks [N, R, R] bool,
        boxes [N, 4] xyxy).
        """
        target = target or self.resolution
        return _generate_proposals_jit(rgb, depth, target, self.resolution)


@partial(jax.jit, static_argnames=("target", "res"))
def _generate_proposals_jit(rgb: jax.Array, depth: jax.Array, target: int, res: int):
    masks = depth > 0
    # Degenerate-mask fallback: a centred res/2 square (reference
    # template.py:75-77 uses 210×210 inside 420).
    q = res // 4
    fallback = jnp.zeros((res, res), bool).at[q : res - q, q : res - q].set(True)
    small = jnp.sum(masks, axis=(1, 2)) < DEGENERATE_MASK_MIN_PX
    masks = jnp.where(small[:, None, None], fallback[None], masks)
    boxes = jax.vmap(mask_to_bbox)(masks)
    props = crop_resize_pad(rgb.transpose(0, 3, 1, 2), boxes, target)
    return props, masks, boxes


@partial(jax.jit, static_argnames=("res",))
def zoom_intrinsics_for_poses(
    v: jax.Array,  # [Vmax, 3] padded (pre-scaled) vertices
    f: jax.Array,  # [Fmax, 3] padded faces
    face_valid: jax.Array,  # [Fmax] bool
    poses: jax.Array,  # [P, 4, 4]
    k: jax.Array,  # [3, 3] base camera
    res: int,
):
    """Per-pose ZOOMED intrinsics: map each pose's projected-vertex bbox
    onto the full res×res canvas with crop_resize_pad's convention
    (isotropic max-side scale, centred) so a render under k_zoom[p] IS the
    proposal crop at native resolution — the crop-resample step of the
    reference flow (render full frame -> crop -> upsample,
    renderer.py:109-130 + online_pose_estimator.py:60-63) disappears and
    the object is rasterized at the full feature resolution. A mesh's
    silhouette extremes are projected vertices, so the bbox needs no
    rasterization. Degenerate projections (behind camera / empty mesh)
    fall back to the unzoomed k. Returns [P, 3, 3]."""
    vmask = (
        jnp.zeros((v.shape[0],), bool)
        .at[f.reshape(-1)]
        .set(jnp.repeat(face_valid, 3))
    )

    def one(pose):
        pc = v @ pose[:3, :3].T + pose[:3, 3]
        z = pc[:, 2]
        ok = vmask & (z > 1e-6)
        zs = jnp.maximum(z, 1e-6)
        u = pc[:, 0] / zs * k[0, 0] + k[0, 2]
        w = pc[:, 1] / zs * k[1, 1] + k[1, 2]
        big = jnp.float32(1e9)
        x1 = jnp.clip(jnp.min(jnp.where(ok, u, big)), 0.0, res - 1.0)
        x2 = jnp.clip(jnp.max(jnp.where(ok, u, -big)), 0.0, res - 1.0)
        y1 = jnp.clip(jnp.min(jnp.where(ok, w, big)), 0.0, res - 1.0)
        y2 = jnp.clip(jnp.max(jnp.where(ok, w, -big)), 0.0, res - 1.0)
        bw = jnp.maximum(x2 - x1, 1.0)
        bh = jnp.maximum(y2 - y1, 1.0)
        s = res / jnp.maximum(bw, bh)
        pad_l = (res - bw * s) / 2.0
        pad_t = (res - bh * s) / 2.0
        kz = jnp.array(
            [
                [k[0, 0], 0.0, k[0, 2] - x1],
                [0.0, k[1, 1], k[1, 2] - y1],
                [0.0, 0.0, 1.0],
            ],
            jnp.float32,
        )
        kz = kz.at[0].mul(s).at[1].mul(s)
        kz = kz.at[0, 2].add(pad_l).at[1, 2].add(pad_t)
        kz = kz.at[2, 2].set(1.0)
        return jnp.where(jnp.any(ok), kz, k)

    return jax.vmap(one)(poses)


def render_template_views(
    mesh: TriMesh,
    n_poses: int = 600,
    resolution: int = TEMPLATE_RES,
    scale: float = RENDERING_SCALE,
    **kwargs,
) -> dict:
    """One-call template pack for a mesh: rgb/depth/masks/poses/intrinsics.
    This is the webdataset-shard payload of the reference's render_templates
    stage (scripts/render_templates.py:49-72) kept device-resident instead of
    round-tripping PNG bytes."""
    renderer = TemplateRenderer(n_poses=n_poses, resolution=resolution, **kwargs)
    rgb, depth = renderer.render(mesh, scale=scale)
    return {
        "rgb": rgb,
        "depth": depth,
        "poses": renderer.poses,
        "intrinsic": renderer.k,
        "masks": depth > 0,
    }


def encode_depth_png_mm(depth: np.ndarray) -> np.ndarray:
    """Metric depth [H, W] float -> uint16 millimetres (shard format,
    reference render_templates.py:66-69)."""
    return np.clip(np.asarray(depth) * 1000.0, 0, 65535).astype(np.uint16)


def decode_depth_png_mm(depth_mm: np.ndarray) -> np.ndarray:
    return np.asarray(depth_mm).astype(np.float32) / 1000.0
