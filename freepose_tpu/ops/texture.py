"""True texture-mapped rendering on top of the TPU rasterizer.

The reference renders textured trimeshes through pyrender/GL
(src/pipeline/retrieval/renderer.py:37-68; textures up to 16384 px,
scripts/resize_meshes.py:40-47). The TPU-native equivalent splits the GL
fragment stage in two:

  1. UV pass — the existing rasterizer interpolates a per-vertex (u, v, w)
     attribute exactly like vertex colors (perspective-correct 1/z
     weighting), so BOTH backends (XLA and the Pallas VMEM-tile kernel) gain
     texture support with zero kernel changes and stay pixel-identical. The
     third channel w carries "has a real vt reference" validity (it
     interpolates like any attribute, so any no-vt ancestry shows up as
     w < 1 and falls back to the bake's gray).
  2. Texture lookup — one gather pass over the FINAL pixels only (not the
     per-tile face candidates): bilinear or nearest sampling of the texture
     at the interpolated UVs. This is the one place the pipeline keeps an
     arbitrary-index gather; it runs once per output pixel, after the
     z-compositing has already collapsed the faces axis.

Vertex-baked colors (io/mesh.py) remain the fallback for meshes without
UVs and for the C++ host twin.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


def uv_to_texel(uv: jax.Array, th: int, tw: int) -> tuple[jax.Array, jax.Array]:
    """OBJ UV ([0,1], v up) -> continuous texel coordinates (x right, y down),
    matching the bake's convention (io/mesh.py:_bake_texture_to_vertices)."""
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (tw - 1)
    y = (1.0 - jnp.clip(uv[..., 1], 0.0, 1.0)) * (th - 1)
    return x, y


@partial(jax.jit, static_argnames=("method",))
def sample_texture(
    uv: jax.Array,  # [..., 2] in [0, 1]
    texture: jax.Array,  # [Ht, Wt, 3] float32 in [0, 1]
    method: str = "bilinear",
) -> jax.Array:
    """Sample `texture` at `uv` -> [..., 3]. One row-gather per tap from the
    flattened [Ht*Wt, 3] texture (taps batched into a single take)."""
    th, tw = texture.shape[:2]
    x, y = uv_to_texel(uv, th, tw)
    flat = texture.reshape(th * tw, 3)
    if method == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, tw - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, th - 1)
        return flat[(yi * tw + xi).reshape(-1)].reshape(*uv.shape[:-1], 3)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, tw - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, th - 1)
    x1 = jnp.minimum(x0 + 1, tw - 1)
    y1 = jnp.minimum(y0 + 1, th - 1)
    fx = (x - x0.astype(x.dtype))[..., None]
    fy = (y - y0.astype(y.dtype))[..., None]
    idx = jnp.stack(
        [y0 * tw + x0, y0 * tw + x1, y1 * tw + x0, y1 * tw + x1], axis=-1
    )  # [..., 4]
    taps = flat[idx.reshape(-1)].reshape(*idx.shape, 3)  # [..., 4, 3]
    top = taps[..., 0, :] * (1 - fx) + taps[..., 1, :] * fx
    bot = taps[..., 2, :] * (1 - fx) + taps[..., 3, :] * fx
    return top * (1 - fy) + bot * fy


def render_textured(
    vertices: jax.Array,  # [V, 3]
    uvw: jax.Array,  # [V, 3]: (u, v, has_vt) — io/mesh.py pad_uv layout
    faces: jax.Array,  # [F, 3]
    face_valid: jax.Array,  # [F]
    poses: jax.Array,  # [P, 4, 4]
    k: jax.Array,  # [3, 3] or [P, 3, 3]
    texture: jax.Array,  # [Ht, Wt, 3] float32 in [0, 1]
    settings,
    method: str = "bilinear",
    pose_chunk: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Textured render -> (rgb [P, R, R, 3], depth [P, R, R]); same contract
    (ambient shading, background zeros) as rasterizer.rasterize."""
    from freepose_tpu.ops.rasterizer import render_meshes

    # UV pass: interpolate (u, v, w) as the color attribute. ambient=1.0
    # makes the kernels' clip(attr * ambient, 0, 1) an exact no-op for
    # attributes already in [0, 1].
    uv_settings = dataclasses.replace(settings, ambient=1.0, depth_only=False)
    uv_img, depth = render_meshes(
        vertices, uvw, faces, face_valid, poses, k, uv_settings,
        pose_chunk=pose_chunk,
    )
    return shade_uv_image(uv_img, depth, texture, settings.ambient, method)


@partial(jax.jit, static_argnames=("method",))
def shade_uv_image(
    uv_img: jax.Array,  # [P, R, R, 3] interpolated (u, v, w)
    depth: jax.Array,  # [P, R, R]
    texture: jax.Array,
    ambient: float,
    method: str = "bilinear",
) -> tuple[jax.Array, jax.Array]:
    hit = depth > 0
    rgb = sample_texture(uv_img[..., :2], texture, method)
    rgb = jnp.clip(rgb * ambient, 0.0, 1.0)
    # Any no-vt ancestry (w < 1) falls back to the bake's 0.7 gray
    # (io/mesh.py:load_obj), clipped through the same ambient shading.
    gray = jnp.clip(jnp.float32(0.7) * ambient, 0.0, 1.0)
    rgb = jnp.where(uv_img[..., 2:3] < 0.999, gray, rgb)
    rgb = jnp.where(hit[..., None], rgb, 0.0)
    return rgb, depth
