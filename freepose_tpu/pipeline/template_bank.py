"""Per-mesh template packs: features + pointcloud statistics, HBM-cached.

The reference caches [600, 900, 1024] template features per mesh in an
OrderedDict RAM tier + flock'd .pth disk tier (pose_estimator.py:38-74), and
re-backprojects full 420² depth maps at query time for the z-lift
(pose_estimator.py:103-113). Here each mesh reduces ONCE to a compact pack:

  * `feats`   [V, G², D]  L2-normalized patch features (the scoring operand),
  * `pc_min/pc_max/pc_mean` [V, 3]  pointcloud statistics of each view's
    depth — the ONLY thing the z-lift actually consumes, so the 600×420²
    depth maps never need to be cached or re-backprojected.

Packs live in an LRU dict of device arrays (HBM) with an optional .npz disk
tier; eviction is just dropping the reference (XLA frees the buffers).
"""
from __future__ import annotations

import dataclasses
from collections import OrderedDict
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.camera import backproject_depth
from freepose_tpu.geometry.pointcloud import masked_mean
from freepose_tpu.pipeline.renderer import TemplateRenderer, template_intrinsics


@dataclasses.dataclass
class TemplatePack:
    name: str
    feats: jax.Array  # [V, G*G, D] normalized patch features
    pc_min: jax.Array  # [V, 3]
    pc_max: jax.Array  # [V, 3]
    pc_mean: jax.Array  # [V, 3]
    poses: jax.Array  # [V, 4, 4]


@partial(jax.jit, static_argnames=())
def depth_stats(depths: jax.Array, k: jax.Array):
    """[V, H, W] depths -> per-view pointcloud (min, max, mean) [V, 3] each."""

    def one(depth):
        pts, valid = backproject_depth(depth, k)
        big = jnp.float32(1e30)
        vmin = jnp.min(jnp.where(valid[:, None], pts, big), axis=0)
        vmax = jnp.max(jnp.where(valid[:, None], pts, -big), axis=0)
        mean = masked_mean(pts, valid)
        # Empty view: degenerate zero-extent cloud at the origin.
        any_valid = jnp.any(valid)
        vmin = jnp.where(any_valid, vmin, 0.0)
        vmax = jnp.where(any_valid, vmax, 0.0)
        return vmin, vmax, mean

    return jax.lax.map(one, depths)


@partial(jax.jit, static_argnames=())
def depth_stats_per_k(depths: jax.Array, ks: jax.Array):
    """depth_stats with per-view intrinsics [V, 3, 3] (zoomed-render path —
    the backprojected 3D cloud is the same object geometry whichever zoom
    rendered it, so downstream z-lift consumes these stats unchanged)."""

    def one(args):
        depth, k = args
        pts, valid = backproject_depth(depth, k)
        big = jnp.float32(1e30)
        vmin = jnp.min(jnp.where(valid[:, None], pts, big), axis=0)
        vmax = jnp.max(jnp.where(valid[:, None], pts, -big), axis=0)
        mean = masked_mean(pts, valid)
        any_valid = jnp.any(valid)
        vmin = jnp.where(any_valid, vmin, 0.0)
        vmax = jnp.where(any_valid, vmax, 0.0)
        return vmin, vmax, mean

    return jax.lax.map(one, (depths, ks))


def normalize_feats(feats: jax.Array) -> jax.Array:
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)


class TemplateBank:
    """Builds and caches TemplatePacks.

    `feature_fn(images [B,3,T,T]) -> [B, G², D]` is the DINOv2 patch
    extractor (already layer-truncated); `renderer` renders the pose grid.
    """

    def __init__(
        self,
        feature_fn,
        renderer: TemplateRenderer | None = None,
        cache_size: int = 4,
        cache_dir: str | Path | None = None,
        batch_size: int = 128,
    ):
        self.feature_fn = feature_fn
        self.renderer = renderer or TemplateRenderer()
        self.cache: OrderedDict[str, TemplatePack] = OrderedDict()
        self.cache_size = cache_size
        self.cache_dir = Path(cache_dir) if cache_dir else None
        if self.cache_dir:
            self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.batch_size = batch_size
        self.k = self.renderer.k

    def _extract_feats(self, images: jax.Array) -> jax.Array:
        outs = []
        for i in range(0, images.shape[0], self.batch_size):
            outs.append(self.feature_fn(images[i : i + self.batch_size]))
        return normalize_feats(jnp.concatenate(outs))

    def build_pack(self, name: str, mesh) -> TemplatePack:
        rgb, depth = self.renderer.render(mesh)
        props, _, _ = self.renderer.generate_proposals(rgb, depth)
        feats = self._extract_feats(props)
        pc_min, pc_max, pc_mean = depth_stats(depth, self.k)
        return TemplatePack(name, feats, pc_min, pc_max, pc_mean, self.renderer.poses)

    def pack_from_views(self, name: str, images: jax.Array, depths: jax.Array, poses: jax.Array, k=None) -> TemplatePack:
        """Build a pack from pre-rendered views (e.g. webdataset shards)."""
        feats = self._extract_feats(images)
        pc_min, pc_max, pc_mean = depth_stats(depths, k if k is not None else template_intrinsics())
        return TemplatePack(name, feats, pc_min, pc_max, pc_mean, poses)

    def get(self, name: str, mesh=None) -> TemplatePack:
        if name in self.cache:
            self.cache.move_to_end(name)
            return self.cache[name]
        pack = self._load_disk(name)
        if pack is None:
            if mesh is None:
                raise KeyError(f"template pack {name!r} not cached and no mesh given")
            pack = self.build_pack(name, mesh)
            self._save_disk(pack)
        self.cache[name] = pack
        if len(self.cache) > self.cache_size:
            self.cache.popitem(last=False)
        return pack

    def _disk_path(self, name: str) -> Path | None:
        return self.cache_dir / f"{name}.npz" if self.cache_dir else None

    def _save_disk(self, pack: TemplatePack) -> None:
        path = self._disk_path(pack.name)
        if path and not path.exists():
            # Atomic publish: write to a per-process temp name, then rename.
            # Concurrent shard workers (the reference flock-guards its .pth
            # cache, pose_estimator.py:44-48) only ever see complete files.
            import os

            tmp = path.with_suffix(f".{os.getpid()}.tmp.npz")  # savez keeps .npz names
            np.savez(
                tmp,
                feats=np.asarray(pack.feats, dtype=np.float16),
                pc_min=np.asarray(pack.pc_min),
                pc_max=np.asarray(pack.pc_max),
                pc_mean=np.asarray(pack.pc_mean),
                poses=np.asarray(pack.poses),
            )
            os.replace(tmp, path)

    def _load_disk(self, name: str) -> TemplatePack | None:
        path = self._disk_path(name)
        if not path or not path.exists():
            return None
        try:
            z = np.load(path)
        except Exception:  # truncated/corrupt cache entry -> rebuild
            return None
        return TemplatePack(
            name,
            jnp.asarray(z["feats"].astype(np.float32)),
            jnp.asarray(z["pc_min"]),
            jnp.asarray(z["pc_max"]),
            jnp.asarray(z["pc_mean"]),
            jnp.asarray(z["poses"]),
        )
