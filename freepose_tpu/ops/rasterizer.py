"""Batched triangle rasterizer for TPU (RGB + depth, z-buffered).

Replaces the reference's three GL renderers — pyrender/EGL template renderer
(src/pipeline/retrieval/renderer.py:37-95), the vispy GLSL eval renderer
(bop_toolkit_lib/renderer_vispy.py) and the external C++ bop_renderer
(bop_toolkit_lib/renderer_cpp.py:13-66) — with a single pure-JAX pipeline that
renders **hundreds of poses in one jit call** instead of the reference's
serial per-pose GL loop (its #1 bottleneck, renderer.py:88-94).

Design (TPU-first):
  * static shapes everywhere: meshes are padded to (Vmax, Fmax); the image is
    split into TILE×TILE tiles; each tile rasterizes at most
    `max_faces_per_tile` candidate faces selected by a top-k over bbox/tile
    overlaps (deterministic, lowest face index first);
  * the per-tile work is a dense [tiles, faces_per_tile, tile_px] einsum-like
    computation of edge functions — pure VPU work that XLA fuses and tiles,
    with no scatter in the inner loop;
  * perspective-correct interpolation of depth and vertex colors;
  * no face culling (the reference renders with SKIP_CULL_FACES,
    renderer.py:66) — coverage uses the sign of the triangle's screen area.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    resolution: int = 420
    tile: int = 28
    max_faces_per_tile: int = 256
    ambient: float = 2.0  # match pyrender Scene(ambient_light=2.0) look
    znear: float = 1e-4
    depth_only: bool = False  # skip color interpolation (silhouette/eval renders)
    # "auto": Pallas VMEM-tile kernel on TPU (3.2x the XLA path, bit-exact),
    # XLA elsewhere. "xla" / "pallas" force a backend.
    backend: str = "auto"
    # Tile-binning algorithm (selection is bit-identical between the two):
    # "sort" replaces the per-tile [T, F] top-k (the dominant prologue cost —
    # measured 3.6 of 7.9 ms/render at 16k faces on one v5e) with one global
    # sort of (tile, face) overlap-pair keys; "topk" is the dense original.
    binning: str = "sort"


def select_tile_faces(
    bb_min: jax.Array,  # [F, 2] face screen-bbox min (u, v)
    bb_max: jax.Array,  # [F, 2]
    valid: jax.Array,  # [F] bool
    grid: int,
    tile: int,
    m: int,
    binning: str = "sort",
) -> tuple[jax.Array, jax.Array]:
    """Per-tile candidate faces: the `m` LOWEST-INDEX valid faces whose screen
    bbox overlaps each tile rectangle [tx, tx+tile]×[ty, ty+tile] (boundary
    inclusive). Returns (top_idx [T, m] int32, sel_valid [T, m] bool) with
    candidates packed ascending by face index — the selection policy both
    rasterizer backends share (deterministic z-tie-break = lowest index).

    binning="topk" scores every (tile, face) pair and top-k's over F lanes —
    O(T·F) sort work dominates the render prologue for large F. "sort"
    produces the IDENTICAL selection from one global sort: each small face
    (screen bbox spanning ≤4 tile rows/cols — everything after mesh
    subdivision) contributes its ≤16 overlapped-tile keys tile_id·F+f, so a
    tile's candidates are a contiguous ascending run; faces spanning more
    tiles (≤512 of them) keep the dense test and merge in a final [T, 16+
    512+...]-lane top-k. The two paths can only diverge if >512 valid faces
    each span >4×4 tiles (then "sort" may drop some where "topk" keeps them
    — unreachable for subdivided meshes; the shared tests pin equality)."""
    n_tiles = grid * grid
    f_total = valid.shape[0]
    m = min(m, f_total)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tx = (tile_ids % grid) * tile
    ty = (tile_ids // grid) * tile
    f_idx = jnp.arange(f_total, dtype=jnp.float32)

    if binning == "topk" or n_tiles * f_total >= 2**31:
        ox = (bb_min[None, :, 0] <= tx[:, None] + tile) & (bb_max[None, :, 0] >= tx[:, None])
        oy = (bb_min[None, :, 1] <= ty[:, None] + tile) & (bb_max[None, :, 1] >= ty[:, None])
        overlap = ox & oy & valid[None, :]  # [T, F]
        sel_scores = jnp.where(overlap, -f_idx, -jnp.inf)
        top_vals, top_idx = jax.lax.top_k(sel_scores, m)
        return top_idx, jnp.isfinite(top_vals)

    span = 4  # small faces: bbox within a span×span tile window
    big_cap = min(512, f_total)
    # Safe integer bounds on the overlapped tile range. f32 division is
    # correctly rounded and i·tile is exactly representable, so
    # floor(bb_max/tile) can never undercount the true max overlapped tile
    # and floor(bb_min/tile)−1 always lower-bounds the min; the exact
    # per-entry overlap test below discards any overcount.
    i0 = jnp.floor(bb_min / tile).astype(jnp.int32) - 1  # [F, 2]
    i1 = jnp.floor(bb_max / tile).astype(jnp.int32)
    small = valid & jnp.all(i1 <= i0 + (span - 1), axis=-1)

    dx = jnp.arange(span, dtype=jnp.int32)
    ti = i0[:, 0:1] + dx[None, :]  # [F, span] candidate tile cols
    tj = i0[:, 1:2] + dx[None, :]  # [F, span] candidate tile rows
    fx = tile * 1.0
    ox = (
        (bb_min[:, 0:1] <= (ti + 1) * fx) & (bb_max[:, 0:1] >= ti * fx)
        & (ti >= 0) & (ti < grid)
    )  # [F, span]
    oy = (
        (bb_min[:, 1:2] <= (tj + 1) * fx) & (bb_max[:, 1:2] >= tj * fx)
        & (tj >= 0) & (tj < grid)
    )
    ent_ok = small[:, None, None] & ox[:, :, None] & oy[:, None, :]  # [F, sx, sy]
    ent_tile = tj[:, None, :] * grid + ti[:, :, None]
    key = jnp.where(
        ent_ok,
        ent_tile * f_total + jnp.arange(f_total, dtype=jnp.int32)[:, None, None],
        jnp.iinfo(jnp.int32).max,
    ).reshape(-1)
    if key.shape[0] < m:
        key = jnp.pad(key, (0, m - key.shape[0]), constant_values=jnp.iinfo(jnp.int32).max)
    keys = jnp.sort(key)
    starts = jnp.searchsorted(keys, tile_ids * f_total).astype(jnp.int32)
    win = jax.vmap(lambda s: jax.lax.dynamic_slice(keys, (s,), (m,)))(starts)  # [T, m]
    win_ok = (win // f_total) == tile_ids[:, None]
    small_cand = jnp.where(win_ok, (win % f_total).astype(jnp.float32), jnp.inf)

    big_vals, big_idx = jax.lax.top_k(jnp.where(valid & ~small, -f_idx, -jnp.inf), big_cap)
    big_ok = jnp.isfinite(big_vals)  # [L]
    b0 = bb_min[big_idx]  # [L, 2]
    b1 = bb_max[big_idx]
    bx = (b0[None, :, 0] <= tx[:, None] + tile) & (b1[None, :, 0] >= tx[:, None])
    by = (b0[None, :, 1] <= ty[:, None] + tile) & (b1[None, :, 1] >= ty[:, None])
    big_cand = jnp.where(
        bx & by & big_ok[None, :], big_idx.astype(jnp.float32)[None, :], jnp.inf
    )  # [T, L]

    cand = jnp.concatenate([small_cand, big_cand], axis=1)  # [T, m + L]
    top_vals, _ = jax.lax.top_k(-cand, m)
    sel_valid = jnp.isfinite(top_vals)
    top_idx = jnp.where(sel_valid, (-top_vals), 0.0).astype(jnp.int32)
    return top_idx, sel_valid


def _project_vertices(vertices: jax.Array, pose: jax.Array, k: jax.Array):
    """Object-space vertices -> (screen uv, camera z)."""
    cam = vertices @ pose[:3, :3].T + pose[:3, 3]
    z = cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = k[0, 0] * cam[:, 0] / safe_z + k[0, 2]
    v = k[1, 1] * cam[:, 1] / safe_z + k[1, 2]
    return jnp.stack([u, v], axis=-1), z


@partial(jax.jit, static_argnames=("settings",))
def rasterize(
    vertices: jax.Array,  # [V, 3] float32 object-space
    colors: jax.Array,  # [V, 3] float32 in [0, 1]
    faces: jax.Array,  # [F, 3] int32
    face_valid: jax.Array,  # [F] bool (padding mask)
    poses: jax.Array,  # [P, 4, 4] camera-from-object (OpenCV convention)
    k: jax.Array,  # [3, 3] intrinsics, or [P, 3, 3] per-pose (crop-adjusted)
    settings: RasterSettings = RasterSettings(),
) -> tuple[jax.Array, jax.Array]:
    """Render P poses -> (rgb [P, R, R, 3] in [0,1], depth [P, R, R])."""
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    per_pose_k = k.ndim == 3
    if settings.backend == "pallas" or (settings.backend == "auto" and on_tpu):
        from freepose_tpu.ops.rasterizer_pallas import rasterize_pallas

        return rasterize_pallas(
            vertices, colors, faces, face_valid, poses, k, settings,
            interpret=not on_tpu,
        )
    res = settings.resolution
    tile = settings.tile
    grid = -(-res // tile)  # tiles per side
    n_tiles = grid * grid
    m = min(settings.max_faces_per_tile, faces.shape[0])

    def render_one(pose_and_k):
        pose, k_i = pose_and_k
        uv, z = _project_vertices(vertices, pose, k_i)
        tri_uv = uv[faces]  # [F, 3, 2]
        tri_z = z[faces]  # [F, 3]
        in_front = jnp.all(tri_z > settings.znear, axis=-1)
        valid = face_valid & in_front

        # --- Tile binning -------------------------------------------------
        bb_min = jnp.min(tri_uv, axis=1)  # [F, 2]
        bb_max = jnp.max(tri_uv, axis=1)
        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
        tx = (tile_ids % grid) * tile
        ty = (tile_ids // grid) * tile
        # First-M overlapping face indices per tile (deterministic).
        top_idx, sel_valid = select_tile_faces(
            bb_min, bb_max, valid, grid, tile, m, settings.binning
        )

        tri_uv_t = tri_uv[top_idx]  # [T, M, 3, 2]
        tri_z_t = tri_z[top_idx]  # [T, M, 3]
        tri_col_t = colors[faces][top_idx]  # [T, M, 3, 3]

        # --- Per-tile rasterization ---------------------------------------
        px = jnp.arange(tile, dtype=jnp.float32) + 0.5
        pxx, pyy = jnp.meshgrid(px, px)  # [tile, tile]
        pix = jnp.stack([pxx.reshape(-1), pyy.reshape(-1)], axis=-1)  # [tp, 2]
        tile_origin = jnp.stack([tx, ty], axis=-1).astype(jnp.float32)  # [T, 2]
        pix_t = tile_origin[:, None, :] + pix[None, :, :]  # [T, tp, 2]

        a = tri_uv_t[:, :, 0, :]  # [T, M, 2]
        b = tri_uv_t[:, :, 1, :]
        c = tri_uv_t[:, :, 2, :]

        def edge(p, q, x):
            # cross(q - p, x - p) for [T, M, 2] x [T, tp, 2] -> [T, M, tp]
            d = q - p  # [T, M, 2]
            return (
                d[:, :, None, 0] * (x[:, None, :, 1] - p[:, :, None, 1])
                - d[:, :, None, 1] * (x[:, None, :, 0] - p[:, :, None, 0])
            )

        w0 = edge(b, c, pix_t)  # weight of vertex a
        w1 = edge(c, a, pix_t)  # weight of vertex b
        w2 = edge(a, b, pix_t)  # weight of vertex c
        area = (
            (b[:, :, 0] - a[:, :, 0]) * (c[:, :, 1] - a[:, :, 1])
            - (b[:, :, 1] - a[:, :, 1]) * (c[:, :, 0] - a[:, :, 0])
        )[:, :, None]  # [T, M, 1]

        # Coverage: all edge functions on the same side as the area sign
        # (no backface culling), non-degenerate triangle. A small tolerance
        # relative to the triangle area closes fp seam cracks on shared edges
        # (harmless double-shade on the seam instead of pinholes).
        s = jnp.sign(area)
        eps = 1e-5 * jnp.abs(area)
        covered = (w0 * s >= -eps) & (w1 * s >= -eps) & (w2 * s >= -eps)
        covered &= jnp.abs(area) > 1e-12
        covered &= sel_valid[:, :, None]

        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        l0 = w0 * inv_area  # [T, M, tp] barycentric
        l1 = w1 * inv_area
        l2 = w2 * inv_area

        # Perspective-correct: interpolate 1/z and color/z.
        iz = 1.0 / jnp.maximum(tri_z_t, settings.znear)  # [T, M, 3]
        iz_pix = l0 * iz[:, :, 0:1] + l1 * iz[:, :, 1:2] + l2 * iz[:, :, 2:3]
        z_pix = 1.0 / jnp.maximum(iz_pix, 1e-12)  # [T, M, tp]
        z_pix = jnp.where(covered, z_pix, jnp.inf)

        # Depth/arg-min composite over the M candidate faces.
        best = jnp.argmin(z_pix, axis=1)  # [T, tp]
        depth_tile = jnp.take_along_axis(z_pix, best[:, None, :], axis=1)[:, 0, :]
        hit = jnp.isfinite(depth_tile)

        if settings.depth_only:
            rgb_tile = jnp.zeros(depth_tile.shape + (3,), jnp.float32)
        else:
            # Color at every candidate face/pixel (perspective-correct), then
            # pick the z-winner. Shape juggling: [T, M, tp, 3].
            col_over_z = tri_col_t * iz[..., None]  # [T, M, 3, 3]
            col_pix = (
                l0[..., None] * col_over_z[:, :, 0, :][:, :, None, :]
                + l1[..., None] * col_over_z[:, :, 1, :][:, :, None, :]
                + l2[..., None] * col_over_z[:, :, 2, :][:, :, None, :]
            ) * jnp.where(jnp.isfinite(z_pix), z_pix, 0.0)[..., None]
            rgb_tile = jnp.take_along_axis(col_pix, best[:, None, :, None], axis=1)[:, 0]
            rgb_tile = jnp.clip(rgb_tile * settings.ambient, 0.0, 1.0)
            rgb_tile = jnp.where(hit[..., None], rgb_tile, 0.0)
        depth_tile = jnp.where(hit, depth_tile, 0.0)

        # --- Reassemble tiles into the image ------------------------------
        rgb = rgb_tile.reshape(grid, grid, tile, tile, 3).transpose(0, 2, 1, 3, 4)
        rgb = rgb.reshape(grid * tile, grid * tile, 3)[:res, :res]
        depth = depth_tile.reshape(grid, grid, tile, tile).transpose(0, 2, 1, 3)
        depth = depth.reshape(grid * tile, grid * tile)[:res, :res]
        return rgb, depth

    # Sequential map over poses: each pose already exposes tiles×faces×pixels
    # of vector parallelism; batching poses with vmap would multiply the
    # [T, M, tile²] transients past HBM capacity (e.g. 128 poses × 180 MB).
    ks = k if per_pose_k else jnp.broadcast_to(k, (poses.shape[0], 3, 3))
    return jax.lax.map(render_one, (poses, ks))


def render_meshes(
    vertices: jax.Array,
    colors: jax.Array,
    faces: jax.Array,
    face_valid: jax.Array,
    poses: jax.Array,
    k: jax.Array,
    settings: RasterSettings = RasterSettings(),
    pose_chunk: int | None = None,
):
    """rasterize() with optional chunking over poses to bound memory."""
    if pose_chunk is None or poses.shape[0] <= pose_chunk:
        return rasterize(vertices, colors, faces, face_valid, poses, k, settings)
    rgbs, depths = [], []
    for i in range(0, poses.shape[0], pose_chunk):
        ki = k if k.ndim == 2 else k[i : i + pose_chunk]  # per-pose intrinsics
        r, d = rasterize(vertices, colors, faces, face_valid, poses[i : i + pose_chunk], ki, settings)
        rgbs.append(r)
        depths.append(d)
    return jnp.concatenate(rgbs), jnp.concatenate(depths)
