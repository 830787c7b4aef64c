"""Pallas TPU rasterizer kernel: per-tile z-buffered shading in VMEM.

The XLA rasterizer (freepose_tpu.ops.rasterizer) materializes per-pose
[tiles, faces, tile_px] edge-function tensors in HBM (~180 MB per pose at
420² — HBM-bandwidth bound). This kernel keeps the whole [tile_px, faces]
working set in VMEM: HBM traffic per tile drops to the pre-binned face
attributes (a few KB) plus the final [tile_px, 4] depth+rgb write.

Layout (see /opt/skills/guides/pallas_guide.md):
  * grid = (poses × tiles,); one kernel step rasterizes one tile;
  * faces live on LANES (M multiple of 128), pixels on SUBLANES — per-face
    attributes broadcast as [1, M] rows with no transposes;
  * the attribute block is one [ATTRS, M] f32 matrix per tile, precomputed
    by the same XLA binning prologue as the baseline (top-k bbox overlap);
  * coverage / barycentrics / perspective-correct 1/z interpolation follow
    rasterizer.rasterize exactly (same seam-crack epsilon), so the two
    backends are pixel-identical and share tests.

Replaces the reference's GL renderers (pyrender EGL renderer.py:37-95,
renderer_vispy.py, C++ bop_renderer) on the hot fine-refine path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Attribute-matrix rows (ATTRS × faces). Geometry rows first, color last so
# depth_only can drop them.
_ROWS = dict(
    d0x=0, d0y=1, bx=2, by=3,          # edge 0: cross(c-b, p-b)
    d1x=4, d1y=5, cx=6, cy=7,          # edge 1: cross(a-c, p-c)
    d2x=8, d2y=9, ax=10, ay=11,        # edge 2: cross(b-a, p-a)
    iza=12, izb=13, izc=14,            # 1/z at vertices (pre-clamped)
    sgn=15, inv_area=16, eps=17, valid=18,
    c0r=19, c0g=20, c0b=21, c1r=22, c1g=23, c1b=24, c2r=25, c2g=26, c2b=27,
)
N_ATTRS = 32  # padded to a sublane multiple


def _raster_tile_kernel(attr_ref, org_ref, out_ref, *, tile: int, ambient: float,
                        depth_only: bool):
    """One grid step = `tiles_per_step` tiles (unrolled): amortizes the
    per-step Mosaic/DMA overhead that dominates with one-tile steps."""
    n_t = attr_ref.shape[0]
    m = attr_ref.shape[-1]
    tp = tile * tile

    for t in range(n_t):
        def row(name, t=t):
            return attr_ref[t, _ROWS[name]][None, :]  # [1, M]

        ox = org_ref[t, 0, 0]
        oy = org_ref[t, 0, 1]
        pix = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
        px = (pix % tile).astype(jnp.float32) + 0.5 + ox  # [tp, 1]
        py = (pix // tile).astype(jnp.float32) + 0.5 + oy

        w0 = row("d0x") * (py - row("by")) - row("d0y") * (px - row("bx"))
        w1 = row("d1x") * (py - row("cy")) - row("d1y") * (px - row("cx"))
        w2 = row("d2x") * (py - row("ay")) - row("d2y") * (px - row("ax"))

        s = row("sgn")
        eps = row("eps")
        covered = (w0 * s >= -eps) & (w1 * s >= -eps) & (w2 * s >= -eps)
        covered &= row("valid") > 0.5

        inv_area = row("inv_area")
        l0 = w0 * inv_area
        l1 = w1 * inv_area
        l2 = w2 * inv_area
        iz_pix = l0 * row("iza") + l1 * row("izb") + l2 * row("izc")
        z_pix = 1.0 / jnp.maximum(iz_pix, 1e-12)
        z_pix = jnp.where(covered, z_pix, jnp.inf)  # [tp, M]

        depth = jnp.min(z_pix, axis=1, keepdims=True)  # [tp, 1]
        hit = jnp.isfinite(depth)
        depth_out = jnp.where(hit, depth, 0.0)

        if depth_only:
            zeros = jnp.zeros_like(depth_out)
            out_ref[t] = jnp.concatenate([depth_out, zeros, zeros, zeros], axis=1)
            continue

        # One-hot of the argmin face (exactly one lane, ties -> lowest index).
        best = jnp.argmin(z_pix, axis=1, keepdims=True)  # [tp, 1]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (tp, m), 1)
        oh = (lanes == best).astype(jnp.float32)

        zsel = jnp.where(jnp.isfinite(z_pix), z_pix, 0.0)
        chans = []
        for c in ("r", "g", "b"):
            col = (
                l0 * row(f"c0{c}") * row("iza")
                + l1 * row(f"c1{c}") * row("izb")
                + l2 * row(f"c2{c}") * row("izc")
            ) * zsel
            val = jnp.sum(col * oh, axis=1, keepdims=True)  # [tp, 1]
            val = jnp.clip(val * ambient, 0.0, 1.0)
            chans.append(jnp.where(hit, val, 0.0))
        out_ref[t] = jnp.concatenate([depth_out] + chans, axis=1)  # [tp, 4]


def _bin_and_pack(vertices, colors, faces, face_valid, pose, k, settings, m):
    """XLA prologue: project + tile-bin (identical policy to the baseline
    rasterizer) -> ([T, N_ATTRS, M] attribute matrix, [T, 2] tile origins)."""
    from freepose_tpu.ops.rasterizer import _project_vertices, select_tile_faces

    res = settings.resolution
    tile = settings.tile
    grid = -(-res // tile)
    n_tiles = grid * grid

    uv, z = _project_vertices(vertices, pose, k)
    tri_uv = uv[faces]
    tri_z = z[faces]
    in_front = jnp.all(tri_z > settings.znear, axis=-1)
    valid = face_valid & in_front

    bb_min = jnp.min(tri_uv, axis=1)
    bb_max = jnp.max(tri_uv, axis=1)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tx = (tile_ids % grid) * tile
    ty = (tile_ids // grid) * tile
    m_sel = min(m, faces.shape[0])  # lane padding to m happens at pack time
    top_idx, sel_valid = select_tile_faces(
        bb_min, bb_max, valid, grid, tile, m_sel, settings.binning
    )

    # Per-FACE attribute rows first (F ≈ 16k rows — cheap), then ONE packed
    # [T, M, N_ATTRS] row gather. The previous form gathered tri_uv / tri_z /
    # colors separately per (tile, slot) — three skinny-row gathers over
    # T·M ≈ 58k rows per pose that profiled at ~1.9 ms/render (more than the
    # raster kernel itself); full-row gathers are the TPU-friendly layout
    # (same trick as grounding_dino.grid_sample_zeros_quad).
    a = tri_uv[:, 0, :]  # [F, 2]
    b = tri_uv[:, 1, :]
    c = tri_uv[:, 2, :]
    zs = tri_z  # [F, 3]
    cols = colors[faces]  # [F, 3, 3]

    area = (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (c[..., 0] - a[..., 0])
    nondegen = jnp.abs(area) > 1e-12
    iz = 1.0 / jnp.maximum(zs, settings.znear)

    r = _ROWS
    assign = {
        r["d0x"]: c[..., 0] - b[..., 0], r["d0y"]: c[..., 1] - b[..., 1],
        r["bx"]: b[..., 0], r["by"]: b[..., 1],
        r["d1x"]: a[..., 0] - c[..., 0], r["d1y"]: a[..., 1] - c[..., 1],
        r["cx"]: c[..., 0], r["cy"]: c[..., 1],
        r["d2x"]: b[..., 0] - a[..., 0], r["d2y"]: b[..., 1] - a[..., 1],
        r["ax"]: a[..., 0], r["ay"]: a[..., 1],
        r["iza"]: iz[..., 0], r["izb"]: iz[..., 1], r["izc"]: iz[..., 2],
        r["sgn"]: jnp.sign(area), r["inv_area"]: jnp.where(nondegen, 1.0 / area, 0.0),
        r["eps"]: 1e-5 * jnp.abs(area),
        r["valid"]: nondegen.astype(jnp.float32),  # per-tile AND below
    }
    if not settings.depth_only:
        for vi in range(3):
            for ci, ch in enumerate("rgb"):
                assign[r[f"c{vi}{ch}"]] = cols[:, vi, ci]
    face_rows = jnp.stack(
        [assign.get(i, jnp.zeros((faces.shape[0],))) for i in range(N_ATTRS)], axis=1
    )  # [F, N_ATTRS]
    gathered = face_rows[top_idx]  # [T, M', N_ATTRS] — one full-row gather
    gathered = gathered.at[:, :, r["valid"]].multiply(sel_valid.astype(jnp.float32))
    stacked = gathered.transpose(0, 2, 1)  # [T, N_ATTRS, M']
    if m_sel < m:  # pad faces to the lane multiple; padded lanes are invalid
        stacked = jnp.pad(stacked, ((0, 0), (0, 0), (0, m - m_sel)))
    origins = jnp.stack([tx, ty], axis=-1).astype(jnp.float32)
    return stacked, origins


@partial(jax.jit, static_argnames=("settings", "interpret"))
def rasterize_pallas(
    vertices: jax.Array,
    colors: jax.Array,
    faces: jax.Array,
    face_valid: jax.Array,
    poses: jax.Array,
    k: jax.Array,
    settings,
    interpret: bool = False,
):
    """Drop-in replacement for rasterizer.rasterize (same outputs)."""
    res = settings.resolution
    tile = settings.tile
    grid = -(-res // tile)
    n_tiles = grid * grid
    tp = tile * tile
    # Faces on lanes: round the per-tile face cap to a lane multiple.
    m = min(settings.max_faces_per_tile, faces.shape[0])
    m = -(-m // 128) * 128

    def prologue(pose_and_k):
        pose, k_i = pose_and_k
        return _bin_and_pack(vertices, colors, faces, face_valid, pose, k_i, settings, m)

    # k: [3, 3] shared or [P, 3, 3] per-pose (e.g. crop-zoomed intrinsics).
    ks = k if k.ndim == 3 else jnp.broadcast_to(k, (poses.shape[0], 3, 3))
    # vmap, not lax.map: the prologue (projection + the binning SORT) is the
    # dominant per-render cost at production face counts (bench_raster: 9.0
    # ms/render at 16k faces vs 5.5 at 4k, nearly m-independent) and lax.map
    # runs it once per pose SEQUENTIALLY, underutilizing the chip; vmap
    # batches all P poses' sorts/top-ks into single ops.
    attrs, origins = jax.vmap(prologue)((poses, ks))  # [P, T, A, M], [P, T, 2]
    p = poses.shape[0]
    attrs = attrs.reshape(p * n_tiles, N_ATTRS, m)
    origins = origins.reshape(p * n_tiles, 1, 2)

    # Tiles per grid step: the largest divisor of n_tiles that keeps (a) the
    # attribute block under ~1 MB and (b) the kernel's scoped VMEM under the
    # 16 MB stack limit — each unrolled tile holds ~2x tp*m*4 B of live
    # [tile_px, faces] temporaries (coefficient measured from compiler OOM
    # reports: 20.11M at 7 tiles x 1369 px x 256 faces). One-tile steps are
    # per-step-overhead bound (measured 45 vs 76 renders/s on v5e).
    tile_scope = 2 * tp * m * 4
    tps_budget = min(
        9,
        max(1, (1 << 20) // (N_ATTRS * m * 4)),
        max(1, (16 << 20) // tile_scope),
    )
    tiles_per_step = 1
    for d in range(1, n_tiles + 1):
        if n_tiles % d == 0 and d <= tps_budget:
            tiles_per_step = d

    kernel = partial(
        _raster_tile_kernel, tile=tile, ambient=settings.ambient,
        depth_only=settings.depth_only,
    )
    out = pl.pallas_call(
        kernel,
        grid=(p * n_tiles // tiles_per_step,),
        in_specs=[
            pl.BlockSpec((tiles_per_step, N_ATTRS, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tiles_per_step, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tiles_per_step, tp, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p * n_tiles, tp, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(attrs, origins)

    # [P*T, tp, 4] -> images.
    out = out.reshape(p, grid, grid, tile, tile, 4)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(p, grid * tile, grid * tile, 4)
    out = out[:, :res, :res]
    depth = out[..., 0]
    rgb = out[..., 1:4]
    return rgb, depth
