"""Attribute the Pallas rasterizer's cost: binning prologue vs tile kernel.

The fine-refine miss path renders up to 16 views per frame, a large share of
miss-frame cost. Timing the prologue in isolation is misleading (returning
the packed attribute tensor from its own program changes layout/fusion), so
this sweeps shapes whose costs scale differently instead:

  * faces F:    the binning top-k scales with F, the kernel does not
    (it always sees `max_faces_per_tile` lanes);
  * lane cap m: the kernel scales with m, the top-k is ~independent of k;
  * tile size:  changes the tile count (prologue rows) and VMEM block shape.

  python -m scripts.bench_raster              # production shapes on the chip
  python -m scripts.bench_raster --tiny       # CPU smoke test
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def bumpy_sphere(n_lat: int, n_lon: int):
    """The bench_refine synthetic mesh (realistic small-triangle topology)."""
    import numpy as np

    verts = []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.15 * np.sin(4 * ph) * np.sin(3 * th)
            verts.append([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph), r * np.cos(th)])
    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    v = np.asarray(verts, np.float32)
    v /= np.abs(v).max()
    return v, np.asarray(faces, np.int32)


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from freepose_tpu.ops.rasterizer import RasterSettings, rasterize

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--poses", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--backend", default="pallas")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    if args.tiny:
        configs = [("tiny", 16, 14, 56, 28, 256)]
        args.poses, args.iters = 2, 1
    else:
        # label, n_lat, n_lon, res, tile, max_faces_per_tile
        configs = [
            ("prod        ", 90, 90, 420, 28, 256),
            ("F/4         ", 45, 45, 420, 28, 256),
            ("m=128       ", 90, 90, 420, 28, 128),
            ("m=512       ", 90, 90, 420, 28, 512),
            # tile 42/60 OOM scoped VMEM (measured: 4 unrolled 42² tiles
            # allocate 19.8M > 16M — the per-tile live-set coefficient grows
            # past the heuristic's 2x beyond ~1400 px tiles).
            ("depth_only  ", 90, 90, 420, 28, 256),
            ("textured    ", 90, 90, 420, 28, 256),
        ]

    poses = np.tile(np.eye(4, dtype=np.float32), (args.poses, 1, 1))
    poses[:, 2, 3] = 1.1
    th = rng.random(args.poses) * 2 * np.pi
    poses[:, 0, 0] = np.cos(th)
    poses[:, 0, 1] = -np.sin(th)
    poses[:, 1, 0] = np.sin(th)
    poses[:, 1, 1] = np.cos(th)
    p = jnp.asarray(poses)

    for label, n_lat, n_lon, res, tile, m_cap in configs:
        verts, faces = bumpy_sphere(n_lat, n_lon)
        verts = verts * 0.25  # rendering scale
        nf = len(faces)
        settings = RasterSettings(
            resolution=res, tile=tile, max_faces_per_tile=m_cap,
            depth_only=label.strip() == "depth_only",
            backend=args.backend,
        )
        k = np.array([[600.0, 0, res / 2], [0, 600.0, res / 2], [0, 0, 1]], np.float32)
        v = jnp.asarray(verts)
        c = jnp.asarray(rng.random((len(verts), 3)).astype(np.float32))
        f = jnp.asarray(faces)
        fv = jnp.ones((nf,), bool)
        kk = jnp.asarray(k)

        if label.strip() == "textured":
            # Per-pixel atlas sampling (ops/texture.py): UV pass + lookup.
            from freepose_tpu.ops.texture import render_textured

            n_lon_v = n_lon
            iv = np.arange(len(verts))
            uvw = np.stack([
                (iv % n_lon_v) / max(n_lon_v - 1, 1),
                (iv // n_lon_v) / max(n_lat, 1),
                np.ones(len(verts)),
            ], axis=1).astype(np.float32)
            tex = jnp.asarray(rng.random((1024, 1024, 3)).astype(np.float32))
            uvj = jnp.asarray(uvw)
            fn = lambda: render_textured(v, uvj, f, fv, p, kk, tex, settings)
        else:
            fn = lambda: rasterize(v, c, f, fv, p, kk, settings)
        rgb, depth = fn()
        np.asarray(depth).reshape(-1)[:1]
        t0 = time.perf_counter()
        for _ in range(args.iters):
            rgb, depth = fn()
        np.asarray(depth).reshape(-1)[:1]
        dt = (time.perf_counter() - t0) / args.iters
        per = 1e3 * dt / args.poses
        cov = float(jnp.mean((np.asarray(depth) > 0)))
        print(f"{label}: {1e3 * dt:8.2f} ms/batch  {per:6.2f} ms/render  "
              f"({nf} faces, tile {tile}, m {m_cap}, res {res}, cov {cov:.2f})")


if __name__ == "__main__":
    main()
