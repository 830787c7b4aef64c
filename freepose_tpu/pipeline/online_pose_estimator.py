"""Online (per-frame) fine pose refinement by local re-render and re-score.

TPU-native counterpart of DinoOnlinePoseEstimator (reference
src/pipeline/estimators/online_pose_estimator.py:16-96): frame 0 runs the
coarse 600-view estimator; subsequent frames filter a dense n-pose
super-Fibonacci grid (10-20k) to the geodesic neighbourhood (<15°) of the
previous pose, re-render the mesh at those poses, re-score against the query
features, and z-lift the winner.

TPU-first differences:
  * the variable-size `np.where(dists < 15°)` neighbourhood becomes a
    FIXED-size top-k of nearest grid poses with a distance mask — static
    shapes end to end, so the whole refine step is jit + batched. On the
    reference's 10k super-Fibonacci grid a 15° geodesic ball holds 9.3
    poses on average (max 13 over 200 on-grid probes), so the default
    n_neighbors=32 over-provisions ~2.5× past the worst case while
    rendering 8× fewer views than a naive 256 cap; out-of-ball views are
    masked to -inf before the argmax either way;
  * renders happen in one batched rasterizer call, not a serial GL loop
    (the reference's dominant cost, SURVEY.md §3.3);
  * masked scoring pools over the union mask at the DINOv2 patch grid
    (reference online_pose_estimator.py:69-74).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.rotation import geodesic_distance, template_poses
from freepose_tpu.ops.sampling import resize_area
from freepose_tpu.pipeline.pose_estimator import CoarsePoseEstimator, PoseEstimate, score_and_lift
from freepose_tpu.pipeline.renderer import RENDERING_SCALE, TemplateRenderer
from freepose_tpu.pipeline.template_bank import TemplatePack, depth_stats, normalize_feats


@partial(jax.jit, static_argnames=("n_neighbors",))
def select_neighborhood(
    fine_poses: jax.Array,  # [N, 4, 4] pose grid
    prev_pose: jax.Array,  # [4, 4]
    neighborhood_deg: float,
    n_neighbors: int,
):
    """Nearest `n_neighbors` grid poses to prev_pose + within-threshold mask."""
    dists = geodesic_distance(fine_poses[:, :3, :3], prev_pose[:3, :3])
    neg, idx = jax.lax.top_k(-dists, n_neighbors)
    mask = (-neg) < neighborhood_deg
    # Always keep at least the single nearest pose.
    mask = mask.at[0].set(True)
    return fine_poses[idx], idx, mask


@partial(jax.jit, static_argnames=("grid", "use_mask"))
def rescore_views(
    render_feats: jax.Array,  # [R, G², D] normalized patch feats of renders
    query_feat: jax.Array,  # [G², D] normalized
    view_valid: jax.Array,  # [R] bool (neighborhood mask)
    render_masks: jax.Array,  # [R, H, W] bool render masks
    proposal_mask: jax.Array,  # [H, W] bool query proposal mask
    grid: int,
    use_mask: bool,
):
    """Cosine rescoring, optionally weighted by the union mask at the patch
    grid (reference online_pose_estimator.py:68-76)."""
    per_patch = jnp.einsum(
        "rgd,gd->rg", render_feats, query_feat, preferred_element_type=jnp.float32
    )
    if use_mask:
        union = jnp.logical_or(render_masks, proposal_mask[None]).astype(jnp.float32)
        w = resize_area(union, (grid, grid)).reshape(render_feats.shape[0], grid * grid)
        scores = jnp.sum(per_patch * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1e-6)
    else:
        scores = per_patch.mean(axis=-1)
    return jnp.where(view_valid, scores, -jnp.inf)


class OnlinePoseEstimator:
    def __init__(
        self,
        feature_fn,
        bank,
        renderer: TemplateRenderer | None = None,
        n_coarse_poses: int = 600,
        n_fine_poses: int = 10000,
        n_neighbors: int = 32,
        rendering_scale: float = RENDERING_SCALE,
        extractor=None,
        feature_layer: int = 22,
        fine_cache_capacity: int = 0,
        shard_mesh=None,
        zoom_renders: bool = False,
    ):
        """When `extractor` (a DinoFeatureExtractor) is given, the refine
        step fuses feature extraction INTO the prepare program (2 dispatches
        per frame instead of 3); otherwise `feature_fn` runs separately.

        `fine_cache_capacity` > 0 (requires `extractor`) additionally caches
        per-view render features/masks/stats by fine-grid index across frames
        of a track (exact reuse — see pipeline/fine_cache.py): warm frames
        featurize only the query crop plus newly-entered views, in ONE
        dispatch.

        `shard_mesh` (a jax.sharding.Mesh with a "model" axis; requires
        `extractor`) fans per-frame neighbor renders + feature batches over
        the mesh — multi-chip latency scaling. It COMPOSES with the fine
        cache: cache buffers replicate over the mesh and only each miss
        batch's cold work shards (see fine_cache.cached_refine_update);
        without the cache, the full neighborhood shards every frame
        (refine_sharded)."""
        self.coarse = CoarsePoseEstimator(feature_fn, bank, n_poses=n_coarse_poses)
        self.feature_fn = feature_fn
        self.renderer = renderer or bank.renderer
        self.fine_poses = template_poses(n_fine_poses)
        self.n_neighbors = n_neighbors
        self.rendering_scale = rendering_scale
        self.extractor = extractor
        self.feature_layer = feature_layer
        self.patch_grid = None  # inferred from first feature call
        if fine_cache_capacity and extractor is None:
            raise ValueError("fine_cache_capacity requires `extractor`")
        if fine_cache_capacity and fine_cache_capacity < n_neighbors:
            raise ValueError(
                f"fine_cache_capacity ({fine_cache_capacity}) must hold at "
                f"least one neighbourhood (n_neighbors={n_neighbors})"
            )
        self.fine_cache_capacity = fine_cache_capacity
        if shard_mesh is not None and extractor is None:
            raise ValueError("shard_mesh requires `extractor`")
        if shard_mesh is not None and fine_cache_capacity:
            # Composition: cache buffers replicate over the mesh; each miss
            # batch's render+featurize shards over the "model" axis (see
            # fine_cache.cached_refine_update). Miss buckets must divide the
            # axis, so they start at the device count.
            if n_neighbors % shard_mesh.shape["model"]:
                raise ValueError(
                    f"n_neighbors ({n_neighbors}) must divide evenly over the "
                    f"'model' mesh axis ({shard_mesh.shape['model']} devices)"
                )
        self.shard_mesh = shard_mesh
        # zoom_renders: render each fine view under per-pose ZOOMED
        # intrinsics (renderer.zoom_intrinsics_for_poses) so the render is
        # the proposal at native resolution — no crop-upsample. Changes
        # rescore numerics vs the reference (which resamples BOTH sides the
        # same way), hence opt-in; see STATUS.md for the A/B.
        self.zoom_renders = zoom_renders
        # Extra views pre-cached per miss frame by rounding the miss batch up
        # a bucket, filled with predictively-ordered prefetch. Measured at
        # production shapes (2°/frame, v5e): quota 4 and quota 0 have equal
        # MEAN ms/frame (total per-view work is invariant; speculative waste
        # ≈ amortization gain) but quota 4 halves the MEDIAN (74.5 vs 118 ms
        # — most frames become all-hit), so it's the better default for
        # latency. Set 0 to fill only the natural bucket padding.
        self.prefetch_quota = 4
        self._fine_caches: dict = {}
        self._fine_rots_np = np.asarray(self.fine_poses[:, :3, :3])
        self._last_prev_rot: dict = {}
        self._padded_meshes: dict = {}

    def _padded_mesh(self, key, mesh):
        """Padded device mesh buffers, cached per track: re-uploading ~300 KB
        of vertex/face data per frame costs a host->device transfer the fused
        step would wait on."""
        entry = self._padded_meshes.get(key)
        if entry is None or entry[0] is not mesh:
            entry = (mesh, self.renderer._padded(mesh, self.rendering_scale))
            self._padded_meshes[key] = entry
        return entry[1]

    def estimate(
        self,
        proposal: jax.Array,  # [3, T, T]
        proposal_mask: jax.Array,  # [T, T] bool
        pack: TemplatePack,
        mesh,
        k: jax.Array,
        bbox: jax.Array,
        est_scale: float,
        prev_pose: jax.Array | None = None,
        neighborhood_deg: float = 15.0,
        mask_scores: bool = False,
        cache_key=None,
    ) -> PoseEstimate:
        if prev_pose is None:
            coarse = self.coarse.estimate(
                proposal, pack, k, bbox, est_scale, return_query_feat=True
            )
            query_feat = coarse.query_feat
            prev_pose = coarse.tcos[0]
        else:
            query_feat = None  # cached path featurizes in-program
        if self.fine_cache_capacity:
            return self.refine_cached(
                proposal, proposal_mask, mesh, k, bbox, est_scale, prev_pose,
                neighborhood_deg, mask_scores,
                cache_key=cache_key if cache_key is not None else pack.name,
            )
        if query_feat is None:
            query_feat = self.coarse.query_features(proposal)
        if self.shard_mesh is not None:
            return self.refine_sharded(
                query_feat, proposal_mask, mesh, k, bbox, est_scale, prev_pose,
                device_mesh=self.shard_mesh, neighborhood_deg=neighborhood_deg,
                mask_scores=mask_scores,
            )
        return self.refine(
            query_feat, proposal_mask, mesh, k, bbox, est_scale, prev_pose,
            neighborhood_deg, mask_scores,
        )

    def estimate_frame(
        self,
        objects: list[dict],
        neighborhood_deg: float = 15.0,
        mask_scores: bool = False,
        fuse: bool = False,
    ) -> list[PoseEstimate]:
        """Per-frame refine of M co-tracked objects.

        Each entry of `objects` is a dict with keys `proposal` [3,R,R],
        `proposal_mask` [R,R], `pack`, `mesh`, `k`, `bbox`, `est_scale`,
        `prev_pose` (None -> coarse frame-0 path) and optional `cache_key`.

        With `fuse=True`, all cache-HIT objects share ONE fused dispatch
        (fine_cache.cached_refine_hit_multi: their query crops featurize as a
        single ViT batch) and all cache-MISS objects share ONE fused dispatch
        (cached_refine_update_multi: per-object renders + a single combined
        feature batch); results match the serial path (parity-tested).
        Default is the serial per-object dispatch because it MEASURES FASTER
        on a v5e at production shapes: a batch-1 ViT-L@420² program already
        saturates the chip (M=4 enqueue-rate: serial 100 vs fused 140
        ms/frame), so fusing reduces dispatch count but not device time —
        see STATUS.md. Requires the fine-view cache."""
        if not self.fine_cache_capacity:
            raise ValueError("estimate_frame requires fine_cache_capacity > 0")
        from freepose_tpu.pipeline.fine_cache import (
            cached_refine_hit_multi, cached_refine_update_multi,
            select_neighborhood_host,
        )

        results: list[PoseEstimate | None] = [None] * len(objects)

        def serial(o, key):
            return self.estimate(
                o["proposal"], o["proposal_mask"], o["pack"], o["mesh"],
                o["k"], o["bbox"], o["est_scale"], prev_pose=o.get("prev_pose"),
                neighborhood_deg=neighborhood_deg, mask_scores=mask_scores,
                cache_key=key,
            )

        def obj_key(o):
            key = o.get("cache_key")
            return key if key is not None else o["pack"].name

        if not fuse or len(objects) == 1:
            # Serial per-object dispatch (default, and single-object frames
            # always: the exact single-object programs, no fused variants).
            return [serial(o, obj_key(o)) for o in objects]

        hits: list[tuple[int, dict, object, np.ndarray, np.ndarray]] = []
        misses: list[tuple] = []
        seen_keys: set = set()
        res = self.renderer.resolution
        for pos, o in enumerate(objects):
            key = obj_key(o)
            # Two objects sharing a cache key (same mesh id) must stay
            # serial: a later same-key miss could evict a classified object's
            # slots before the fused dispatch runs.
            share = key in seen_keys
            seen_keys.add(key)
            if share or o.get("prev_pose") is None:
                results[pos] = serial(o, key)
                continue
            if self.shard_mesh is not None:
                # The fused multi-miss update does not compose with shard_map
                # yet: batch only the hits (light probe, no state mutation),
                # and let each miss take the per-object SHARDED update.
                cache = self._fine_caches.get(key)
                if cache is not None:
                    prev = np.asarray(o["prev_pose"])
                    sel_idx, valid = select_neighborhood_host(
                        self._fine_rots_np, prev[:3, :3], neighborhood_deg,
                        self.n_neighbors,
                    )
                    if not cache.missing(sel_idx):
                        self._last_prev_rot[key] = prev[:3, :3]
                        cache.touch(sel_idx)
                        hits.append((pos, o, cache, sel_idx, valid))
                        continue
                results[pos] = serial(o, key)
                continue
            assert o["proposal"].shape[-1] == res, (
                f"cached refine needs the proposal crop at render resolution "
                f"({o['proposal'].shape[-1]} vs {res})"
            )
            cache, sel_idx, valid, near_extra, missing = self._cached_state(
                key, np.asarray(o["prev_pose"]), neighborhood_deg
            )
            if missing:
                misses.append((pos, o, key, cache, sel_idx, valid, near_extra, missing))
            else:
                hits.append((pos, o, cache, sel_idx, valid))

        if len(misses) == 1:
            # One miss object: the exact single-object update program (no
            # M=1 fused variant to compile).
            pos, o, key, cache, sel_idx, valid, near_extra, missing = misses[0]
            results[pos] = self._dispatch_cached(
                key, cache, sel_idx, valid, near_extra, missing,
                o["proposal"], o["proposal_mask"], o["mesh"], o["k"],
                o["bbox"], o["est_scale"], mask_scores,
            )
        elif misses:
            common = dict(
                extractor=self.extractor, layer=self.feature_layer,
                resolution=res, mask_scores=mask_scores,
                rendering_scale=self.rendering_scale,
            )
            # Shared bucket: every miss object renders the same view count
            # (smaller-miss objects get extra prefetch — results unchanged).
            m_b = max(self._natural_bucket(mi[3], mi[7]) for mi in misses)
            plans = [
                self._plan_miss(mi[3], mi[7], mi[6], mi[4], m_b) for mi in misses
            ]
            sel_arr = np.stack([mi[4] for mi in misses])
            (new_feats, new_masks, new_stats, tcos, scores, local, qf,
             ) = cached_refine_update_multi(
                tuple(mi[3].feats for mi in misses),
                tuple(mi[3].masks for mi in misses),
                tuple(mi[3].stats for mi in misses),
                self.fine_poses,
                jnp.asarray(np.stack([p[0] for p in plans])),
                jnp.asarray(np.stack([p[1] for p in plans])),
                tuple(self._padded_mesh(mi[2], mi[1]["mesh"]) for mi in misses),
                self.renderer.k,
                self.extractor.params_for(self.feature_layer),
                jnp.stack([jnp.asarray(mi[1]["proposal"]) for mi in misses]),
                jnp.asarray(np.stack([mi[3].gather_slots(mi[4]) for mi in misses])),
                jnp.asarray(np.stack([mi[5] for mi in misses])),
                jnp.asarray(sel_arr),
                jnp.stack([jnp.asarray(mi[1]["proposal_mask"]) for mi in misses]),
                jnp.stack([jnp.asarray(mi[1]["k"], jnp.float32) for mi in misses]),
                jnp.stack([jnp.asarray(mi[1]["bbox"], jnp.float32) for mi in misses]),
                jnp.stack([jnp.asarray(mi[1]["est_scale"], jnp.float32) for mi in misses]),
                settings=self.renderer.settings,
                pose_chunk=self.renderer.pose_chunk,
                zoom=self.zoom_renders,
                **common,
            )
            for j, mi in enumerate(misses):
                cache = mi[3]
                cache.feats, cache.masks, cache.stats = (
                    new_feats[j], new_masks[j], new_stats[j]
                )
                results[mi[0]] = PoseEstimate(
                    tcos[j], scores[j], jnp.asarray(sel_arr[j])[local[j]], qf[j]
                )

        if hits:
            common = dict(
                extractor=self.extractor, layer=self.feature_layer,
                resolution=self.renderer.resolution, mask_scores=mask_scores,
                rendering_scale=self.rendering_scale,
            )
            sel_arr = np.stack([h[3] for h in hits])
            tcos, scores, local, qf = cached_refine_hit_multi(
                tuple(h[2].feats for h in hits),
                tuple(h[2].masks for h in hits),
                tuple(h[2].stats for h in hits),
                self.fine_poses,
                self.extractor.params_for(self.feature_layer),
                jnp.stack([jnp.asarray(h[1]["proposal"]) for h in hits]),
                jnp.asarray(np.stack([h[2].gather_slots(h[3]) for h in hits])),
                jnp.asarray(np.stack([h[4] for h in hits])),
                jnp.asarray(sel_arr),
                jnp.stack([jnp.asarray(h[1]["proposal_mask"]) for h in hits]),
                jnp.stack([jnp.asarray(h[1]["k"], jnp.float32) for h in hits]),
                jnp.stack([jnp.asarray(h[1]["bbox"], jnp.float32) for h in hits]),
                jnp.stack([jnp.asarray(h[1]["est_scale"], jnp.float32) for h in hits]),
                **common,
            )
            for j, (pos, _, _, _, _) in enumerate(hits):
                results[pos] = PoseEstimate(
                    tcos[j], scores[j], jnp.asarray(sel_arr[j])[local[j]], qf[j]
                )
        return results

    def refine(
        self,
        query_feat: jax.Array,
        proposal_mask: jax.Array,
        mesh,
        k: jax.Array,
        bbox: jax.Array,
        est_scale: float,
        prev_pose: jax.Array,
        neighborhood_deg: float = 15.0,
        mask_scores: bool = False,
    ) -> PoseEstimate:
        # Three device dispatches per frame: prepare (neighborhood + render +
        # crops + cloud stats, one fused program), features, finish (rescore +
        # z-lift). Host round-trips between many small programs cost ~34 ms
        # EACH through a remote-TPU tunnel and ~launch overhead locally.
        v, c, f, fv = self.renderer._padded(mesh, self.rendering_scale)
        if self.extractor is not None:
            # Fully fused: render + crop + featurize in ONE program.
            sel_poses, sel_idx, valid, render_feats, render_masks, stats = _refine_prepare_fused(
                self.fine_poses, prev_pose, jnp.float32(neighborhood_deg),
                v, c, f, fv, self.renderer.k, self.extractor.params_for(self.feature_layer),
                self.renderer.settings, self.n_neighbors, self.renderer.pose_chunk,
                self.renderer.resolution, self.extractor, self.feature_layer,
                self.zoom_renders,
            )
        else:
            sel_poses, sel_idx, valid, props, render_masks, stats = _refine_prepare(
                self.fine_poses, prev_pose, jnp.float32(neighborhood_deg),
                v, c, f, fv, self.renderer.k,
                self.renderer.settings, self.n_neighbors, self.renderer.pose_chunk,
                self.renderer.resolution, self.zoom_renders,
            )
            feats = []
            bs = 128
            for i in range(0, props.shape[0], bs):
                feats.append(self.feature_fn(props[i : i + bs]))
            render_feats = normalize_feats(jnp.concatenate(feats))
        grid = int(round(render_feats.shape[1] ** 0.5))

        tcos, top_scores, local_idx = _refine_finish(
            render_feats, query_feat, valid, render_masks, proposal_mask, stats,
            sel_poses, k, jnp.asarray(bbox, jnp.float32),
            jnp.asarray(est_scale, jnp.float32), grid, mask_scores,
            self.rendering_scale,
        )
        return PoseEstimate(tcos, top_scores, sel_idx[local_idx], query_feat)

    def refine_sharded(
        self,
        query_feat: jax.Array,
        proposal_mask: jax.Array,
        mesh,
        k: jax.Array,
        bbox: jax.Array,
        est_scale: float,
        prev_pose: jax.Array,
        device_mesh=None,
        axis: str = "model",
        neighborhood_deg: float = 15.0,
        mask_scores: bool = False,
    ) -> PoseEstimate:
        """refine() with the per-frame hot work — the n_neighbors renders and
        their ViT feature batch, ~70% of the measured step (STATUS.md) —
        sharded over a device mesh axis via shard_map.

        Each chip renders + featurizes n_neighbors/axis_size views; the tiny
        rescore + z-lift epilogue runs on the reassembled arrays. This is the
        latency-scaling axis the reference lacks entirely (its SLURM arrays
        only scale throughput across videos, SURVEY.md §2.7/§5.8): on a
        v5p-8, 32 neighbor views fan out 4-per-chip, cutting the dominant
        feature term ~8×. Results are identical to single-device refine()
        (parity-tested on the 8-device CPU mesh)."""
        if self.extractor is None:
            raise ValueError("refine_sharded requires `extractor`")
        if device_mesh is None:
            from freepose_tpu.parallel.mesh import make_mesh

            device_mesh = make_mesh()
        n_dev = device_mesh.shape[axis]
        if self.n_neighbors % n_dev:
            raise ValueError(
                f"n_neighbors ({self.n_neighbors}) must divide evenly over "
                f"the '{axis}' mesh axis ({n_dev} devices)"
            )
        v, c, f, fv = self.renderer._padded(mesh, self.rendering_scale)
        sel_poses, sel_idx, valid, render_feats, render_masks, stats = (
            _refine_prepare_fused_sharded(
                self.fine_poses, prev_pose, jnp.float32(neighborhood_deg),
                v, c, f, fv, self.renderer.k, self.extractor.params_for(self.feature_layer),
                self.renderer.settings, self.n_neighbors, self.renderer.pose_chunk,
                self.renderer.resolution, self.extractor, self.feature_layer,
                device_mesh, axis, self.zoom_renders,
            )
        )
        grid = int(round(render_feats.shape[1] ** 0.5))
        tcos, top_scores, local_idx = _refine_finish(
            render_feats, query_feat, valid, render_masks, proposal_mask, stats,
            sel_poses, k, jnp.asarray(bbox, jnp.float32),
            jnp.asarray(est_scale, jnp.float32), grid, mask_scores,
            self.rendering_scale,
        )
        return PoseEstimate(tcos, top_scores, sel_idx[local_idx], query_feat)

    def _cached_state(self, key, prev_np: np.ndarray, neighborhood_deg: float):
        """Host-side bookkeeping for one object's cached refine step: get or
        create the cache, update the prediction state, select the
        neighbourhood (prefetch ordering centres on the EXTRAPOLATED next
        pose — constant angular velocity R_pred = R_rel @ R_prev — so
        miss-frame padding pre-caches the views the trajectory is about to
        enter; selection itself always uses prev, prediction never changes
        results), list misses, touch the LRU."""
        from freepose_tpu.pipeline.fine_cache import (
            FineViewCache, select_neighborhood_host,
        )

        cache = self._ensure_cache(key)
        last = self._last_prev_rot.get(key)
        r_prev = prev_np[:3, :3]
        pred = (r_prev @ last.T) @ r_prev if last is not None else None
        self._last_prev_rot[key] = r_prev
        sel_idx, valid, near_extra = select_neighborhood_host(
            self._fine_rots_np, r_prev, neighborhood_deg, self.n_neighbors,
            n_extra=self.n_neighbors, extra_center=pred,
        )
        missing = cache.missing(sel_idx)
        cache.touch(sel_idx)
        return cache, sel_idx, valid, near_extra, missing

    def _ensure_cache(self, key):
        """Get or create the per-track FineViewCache for `key`."""
        from freepose_tpu.pipeline.fine_cache import FineViewCache

        cache = self._fine_caches.get(key)
        if cache is None:
            cache = self._fine_caches[key] = FineViewCache(self.fine_cache_capacity)
            cfg = self.extractor.config
            res = self.renderer.resolution
            grid = res // cfg.patch_size
            cache.ensure_buffers(grid * grid, cfg.hidden_size, res, cfg.dtype)
        return cache

    def _natural_bucket(self, cache, missing) -> int:
        """Miss-bucket size for one object: the miss count plus the prefetch
        quota, rounded up a bucket (see refine_cached's padding comment)."""
        from freepose_tpu.pipeline.fine_cache import bucket_size

        n_dev = self.shard_mesh.shape["model"] if self.shard_mesh is not None else 1
        max_prefetch = cache.capacity - self.n_neighbors
        target = len(missing) + min(self.prefetch_quota, max_prefetch)
        return bucket_size(min(target, self.n_neighbors), self.n_neighbors, multiple=n_dev)

    def _plan_miss(self, cache, missing, near_extra, sel_idx, m_b):
        """Fill the miss batch up to the bucket with PREFETCH (nearest
        not-yet-cached poses around the predicted next pose — miss frames
        pre-cache what the trajectory needs next, so following frames go
        all-hit; total per-view work is invariant since each view is computed
        exactly once), assign slots (evictions protected against the live
        neighbourhood), pad any remainder into the scratch slot."""
        max_prefetch = cache.capacity - self.n_neighbors
        pad = m_b - len(missing)
        if pad > 0:
            prefetch = cache.missing(near_extra)[: min(pad, max_prefetch)]
            missing = missing + prefetch
        pad = m_b - len(missing)
        write_slots = cache.assign_slots(missing, protect=sel_idx)
        new_idx = np.asarray(missing, np.int32)
        if pad:
            # Not enough uncached prefetch candidates: remaining padding
            # re-renders the first miss into the scratch slot.
            new_idx = np.concatenate([new_idx, np.full(pad, new_idx[0], np.int32)])
            write_slots = np.concatenate(
                [write_slots, np.full(pad, cache.capacity, np.int32)]
            )
        if cache.slot_table is not None:
            # Chain mode: mirror the assignment into the device slot table
            # (padded rows target the scratch row NF / slot `capacity`).
            from freepose_tpu.pipeline.fine_cache import update_slot_table

            nf = cache.slot_table.shape[0] - 1
            ev = np.asarray(
                (cache.last_evicted + [nf] * m_b)[:m_b], np.int32
            )
            gi_set = np.where(write_slots < cache.capacity, new_idx, nf).astype(np.int32)
            cache.slot_table = update_slot_table(
                cache.slot_table, jnp.asarray(ev), jnp.asarray(gi_set),
                jnp.asarray(write_slots),
            )
        return new_idx, write_slots

    def refine_cached(
        self,
        proposal: jax.Array,
        proposal_mask: jax.Array,
        mesh,
        k: jax.Array,
        bbox: jax.Array,
        est_scale: float,
        prev_pose: jax.Array,
        neighborhood_deg: float = 15.0,
        mask_scores: bool = False,
        cache_key=None,
    ) -> PoseEstimate:
        """Refine via the fine-view cache (exact reuse across frames): one
        dispatch per frame, featurizing only the query crop + cache misses.
        See pipeline/fine_cache.py."""
        res = self.renderer.resolution
        assert proposal.shape[-1] == res, (
            f"cached refine needs the proposal crop at render resolution "
            f"({proposal.shape[-1]} vs {res})"
        )
        key = cache_key if cache_key is not None else id(mesh)
        cache, sel_idx, valid, near_extra, missing = self._cached_state(
            key, np.asarray(prev_pose), neighborhood_deg
        )
        return self._dispatch_cached(
            key, cache, sel_idx, valid, near_extra, missing,
            proposal, proposal_mask, mesh, k, bbox, est_scale, mask_scores,
        )

    def _dispatch_cached(
        self, key, cache, sel_idx, valid, near_extra, missing,
        proposal, proposal_mask, mesh, k, bbox, est_scale, mask_scores,
    ) -> PoseEstimate:
        """Device dispatch of one object's cached refine given precomputed
        host state (from _cached_state): miss -> one fused update program,
        all-hit -> the hit program."""
        from freepose_tpu.pipeline.fine_cache import (
            cached_refine_hit, cached_refine_update,
        )

        res = self.renderer.resolution
        common = dict(
            extractor=self.extractor, layer=self.feature_layer,
            resolution=res, mask_scores=mask_scores,
            rendering_scale=self.rendering_scale,
        )
        proposal = jnp.asarray(proposal)
        pmask = jnp.asarray(proposal_mask)
        kq = jnp.asarray(k, jnp.float32)
        bboxq = jnp.asarray(bbox, jnp.float32)
        scaleq = jnp.asarray(est_scale, jnp.float32)

        if missing:
            m_b = self._natural_bucket(cache, missing)
            new_idx, write_slots = self._plan_miss(
                cache, missing, near_extra, sel_idx, m_b
            )
            gather = cache.gather_slots(sel_idx)
            v, c, f, fv = self._padded_mesh(key, mesh)
            (cache.feats, cache.masks, cache.stats, tcos, score, local, qf,
             ) = cached_refine_update(
                cache.feats, cache.masks, cache.stats,
                self.fine_poses, new_idx, write_slots,
                v, c, f, fv, self.renderer.k,
                self.extractor.params_for(self.feature_layer), proposal,
                gather, valid, sel_idx, pmask,
                kq, bboxq, scaleq,
                settings=self.renderer.settings,
                pose_chunk=self.renderer.pose_chunk,
                device_mesh=self.shard_mesh,
                zoom=self.zoom_renders,
                **common,
            )
        else:
            gather = cache.gather_slots(sel_idx)
            tcos, score, local, qf = cached_refine_hit(
                cache.feats, cache.masks, cache.stats,
                self.fine_poses,
                self.extractor.params_for(self.feature_layer), proposal,
                gather, valid, sel_idx, pmask,
                kq, bboxq, scaleq,
                **common,
            )
        return PoseEstimate(tcos, score, jnp.asarray(sel_idx)[local], qf)


def render_view_block(
    v, c, f, fv, poses, k_render, settings, pose_chunk, resolution, zoom,
):
    """Shared fine-view rendering block (trace-time helper, call inside jit):
    returns (props [P,3,R,R], masks [P,R,R], (min,max,mean) cloud stats).
    zoom=False renders the reference full-frame camera and crop-resamples
    (renderer._generate_proposals_jit); zoom=True renders each pose under
    zoomed per-pose intrinsics so the render IS the proposal at native
    resolution (renderer.zoom_intrinsics_for_poses) — the cloud stats use
    the per-view K, and are identical 3D quantities either way."""
    from freepose_tpu.ops.rasterizer import render_meshes
    from freepose_tpu.pipeline.renderer import (
        DEGENERATE_MASK_MIN_PX, _generate_proposals_jit, zoom_intrinsics_for_poses,
    )
    from freepose_tpu.pipeline.template_bank import depth_stats_per_k

    if not zoom:
        rgb, depth = render_meshes(
            v, c, f, fv, poses, k_render, settings, pose_chunk=pose_chunk
        )
        props, masks, _ = _generate_proposals_jit.__wrapped__(
            rgb, depth, resolution, resolution
        )
        smin, smax, smean = depth_stats.__wrapped__(depth, k_render)
        return props, masks, (smin, smax, smean)
    kz = zoom_intrinsics_for_poses.__wrapped__(v, f, fv, poses, k_render, resolution)
    rgb, depth = render_meshes(v, c, f, fv, poses, kz, settings, pose_chunk=pose_chunk)
    masks = depth > 0
    q = resolution // 4
    fallback = (
        jnp.zeros((resolution, resolution), bool)
        .at[q : resolution - q, q : resolution - q]
        .set(True)
    )
    small = jnp.sum(masks, axis=(1, 2)) < DEGENERATE_MASK_MIN_PX
    masks = jnp.where(small[:, None, None], fallback[None], masks)
    props = rgb.transpose(0, 3, 1, 2)
    smin, smax, smean = depth_stats_per_k.__wrapped__(depth, kz)
    return props, masks, (smin, smax, smean)


@partial(jax.jit, static_argnames=("settings", "n_neighbors", "pose_chunk", "resolution", "zoom"))
def _refine_prepare(
    fine_poses, prev_pose, neighborhood_deg, v, c, f, fv, k_render,
    settings, n_neighbors, pose_chunk, resolution, zoom=False,
):
    """Fused: neighborhood top-k + batched render + proposal crops + per-view
    cloud stats — one program, one dispatch."""
    sel_poses, sel_idx, valid = select_neighborhood(
        fine_poses, prev_pose, neighborhood_deg, n_neighbors
    )
    props, render_masks, stats = render_view_block(
        v, c, f, fv, sel_poses, k_render, settings, pose_chunk, resolution, zoom
    )
    return sel_poses, sel_idx, valid, props, render_masks, stats


@partial(jax.jit, static_argnames=(
    "settings", "n_neighbors", "pose_chunk", "resolution", "extractor", "layer", "zoom"))
def _refine_prepare_fused(
    fine_poses, prev_pose, neighborhood_deg, v, c, f, fv, k_render, fe_params,
    settings, n_neighbors, pose_chunk, resolution, extractor, layer, zoom=False,
):
    """_refine_prepare + DINOv2 features on the crops in the SAME program —
    2 dispatches per tracked frame. Extractor params enter as arguments
    (never closed over; see models/dinov2._extract_jit)."""
    from freepose_tpu.models.dinov2 import _extract_jit

    sel_poses, sel_idx, valid, props, render_masks, stats = _refine_prepare.__wrapped__(
        fine_poses, prev_pose, neighborhood_deg, v, c, f, fv, k_render,
        settings, n_neighbors, pose_chunk, resolution, zoom,
    )
    feats = _extract_jit.__wrapped__(extractor, fe_params, props, layer, "patch")
    return sel_poses, sel_idx, valid, normalize_feats(feats), render_masks, stats


@partial(jax.jit, static_argnames=(
    "settings", "n_neighbors", "pose_chunk", "resolution", "extractor", "layer",
    "device_mesh", "axis", "zoom"))
def _refine_prepare_fused_sharded(
    fine_poses, prev_pose, neighborhood_deg, v, c, f, fv, k_render, fe_params,
    settings, n_neighbors, pose_chunk, resolution, extractor, layer,
    device_mesh, axis, zoom=False,
):
    """_refine_prepare_fused with the render + feature work shard_mapped over
    `axis`: the [n_neighbors] selected poses split across chips, mesh buffers
    and extractor params replicated; per-chip output blocks reassemble into
    the global [n_neighbors, ...] arrays the epilogue consumes. zoom renders
    per-pose zoomed intrinsics locally (render_view_block is pure in the
    local poses, so the composition is free)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from freepose_tpu.models.dinov2 import _extract_jit

    sel_poses, sel_idx, valid = select_neighborhood(
        fine_poses, prev_pose, neighborhood_deg, n_neighbors
    )

    def local(poses_local, v, c, f, fv, k_render, fe_params):
        props, render_masks, stats = render_view_block(
            v, c, f, fv, poses_local, k_render, settings, pose_chunk, resolution,
            zoom,
        )
        feats = _extract_jit.__wrapped__(extractor, fe_params, props, layer, "patch")
        return normalize_feats(feats), render_masks, stats

    rep = P()
    sh = P(axis)
    feats, render_masks, stats = shard_map(
        local,
        mesh=device_mesh,
        in_specs=(sh, rep, rep, rep, rep, rep, rep),
        out_specs=(sh, sh, (sh, sh, sh)),
    )(sel_poses, v, c, f, fv, k_render, fe_params)
    return sel_poses, sel_idx, valid, feats, render_masks, stats


@partial(jax.jit, static_argnames=("grid", "mask_scores", "rendering_scale"))
def _refine_finish(
    render_feats, query_feat, valid, render_masks, proposal_mask, stats,
    sel_poses, k, bbox, est_scale, grid, mask_scores, rendering_scale,
):
    """Fused: masked rescoring + argmax + z-lift."""
    scores = rescore_views(
        render_feats, query_feat, valid, render_masks, proposal_mask, grid, mask_scores
    )
    pc_min, pc_max, pc_mean = stats
    return score_and_lift_from_stats(
        scores, pc_min, pc_max, pc_mean, sel_poses, k, bbox, est_scale, rendering_scale
    )


@partial(jax.jit, static_argnames=("rendering_scale",))
def score_and_lift_from_stats(
    scores: jax.Array,
    pc_min: jax.Array,
    pc_max: jax.Array,
    pc_mean: jax.Array,
    poses: jax.Array,
    k: jax.Array,
    bbox: jax.Array,
    est_scale: jax.Array,
    rendering_scale: float,
):
    """argmax + z-lift given precomputed per-view scores and cloud stats."""
    top_score, top_idx = jax.lax.top_k(scores, 1)
    s = est_scale / rendering_scale
    mins = (pc_min[top_idx] - pc_mean[top_idx]) * s + pc_mean[top_idx]
    maxs = (pc_max[top_idx] - pc_mean[top_idx]) * s + pc_mean[top_idx]
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    bb_dx = (bbox[2] - bbox[0]) + 1.0
    bb_dy = (bbox[3] - bbox[1]) + 1.0
    z = (fx * (maxs[:, 0] - mins[:, 0]) / bb_dx + fy * (maxs[:, 1] - mins[:, 1]) / bb_dy) / 2.0
    x = ((bbox[0] + bbox[2]) / 2.0 - cx) * z / fx
    y = ((bbox[1] + bbox[3]) / 2.0 - cy) * z / fy
    tcos = poses[top_idx]
    tcos = tcos.at[:, 0, 3].set(x)
    tcos = tcos.at[:, 1, 3].set(y)
    tcos = tcos.at[:, 2, 3].set(z)
    return tcos, top_score, top_idx[0]


class CachedRefineChain:
    """Pipelined streaming driver for single-object cached refine.

    The serial per-frame loop pays a full host<->device round trip per frame:
    fetch pose t-1 -> host neighbourhood selection -> dispatch frame t. Here
    selection runs ON DEVICE (fine_cache.cached_refine_hit_chain) from the
    previous step's grid index, so consecutive frames enqueue back-to-back
    and the host fetches results asynchronously `lag` frames behind. Closed
    loop only (prev pose = own refine output — exactly the video pipeline's
    feedback, reference dino_inference_video.py:144-156).

    Exactness: a speculative step is USED only when every neighbourhood view
    was cached (all-hit); otherwise the host replays the frame through the
    classic miss path — with identical LRU touch order, eviction protection
    and prefetch-prediction state — and re-enqueues the later speculative
    frames. Results therefore equal the serial closed-loop refine_cached
    sequence bit-for-bit (tests/test_fine_cache.py).
    """

    def __init__(
        self, est: "OnlinePoseEstimator", mesh, cache_key, *,
        neighborhood_deg: float = 15.0, mask_scores: bool = False, lag: int = 3,
    ):
        from collections import deque

        self.est = est
        self.mesh = mesh
        self.key = cache_key
        self.deg = float(neighborhood_deg)
        self.mask_scores = mask_scores
        self.lag = max(1, lag)
        self.pending: "deque" = deque()
        self.results: list[tuple[np.ndarray, float]] = []
        self.n_spec_hits = 0  # speculative frames used as-is
        self.n_replayed = 0  # speculative frames replayed via the miss path
        self._prev_idx_dev = None
        self._prev_rots = deque(maxlen=2)  # rotation used as prev for the last 2 frames
        self._cache = est._ensure_cache(cache_key)
        self._cache.enable_slot_table(est.fine_poses.shape[0])

    # ---------------------------------------------------------------- #
    def submit(self, proposal, proposal_mask, k, bbox, est_scale, prev_pose=None):
        """Queue one frame. The FIRST frame needs prev_pose (the coarse/init
        pose); later frames chain from the refine output (closed loop)."""
        inputs = (
            jnp.asarray(proposal), jnp.asarray(proposal_mask),
            jnp.asarray(k, jnp.float32), jnp.asarray(bbox, jnp.float32),
            jnp.asarray(est_scale, jnp.float32),
        )
        if self._prev_idx_dev is None:
            if prev_pose is None:
                raise ValueError("first frame needs prev_pose")
            prev_np = np.asarray(prev_pose)
            self._prev_rots.append(prev_np[:3, :3].copy())
            out = self.est.refine_cached(
                inputs[0], inputs[1], self.mesh, inputs[2], inputs[3],
                inputs[4], jnp.asarray(prev_np), self.deg,
                mask_scores=self.mask_scores, cache_key=self.key,
            )
            self._note_classic(out)
            self.pending.append(("classic", inputs, out))
        else:
            if prev_pose is not None:
                raise ValueError("chain is closed-loop; prev_pose only seeds frame 0")
            self._submit_spec(inputs)
        self._drain(self.lag)

    def finalize_all(self) -> list[tuple[np.ndarray, float]]:
        """Flush the pipeline; returns [(pose 4x4, score)] for every frame."""
        self._drain(0)
        return self.results

    # ---------------------------------------------------------------- #
    def _note_classic(self, out: PoseEstimate) -> None:
        self._prev_idx_dev = out.view_indices
        for a in (out.tcos, out.scores):
            try:
                a.copy_to_host_async()
            except Exception:
                pass

    def _submit_spec(self, inputs) -> None:
        from freepose_tpu.pipeline.fine_cache import cached_refine_hit_chain

        est, cache = self.est, self._cache
        packed, nxt = cached_refine_hit_chain(
            cache.feats, cache.masks, cache.stats, est.fine_poses,
            cache.slot_table, self._prev_idx_dev, est.extractor.params_for(est.feature_layer),
            inputs[0], inputs[1], inputs[2], inputs[3], inputs[4],
            extractor=est.extractor, layer=est.feature_layer,
            resolution=est.renderer.resolution, mask_scores=self.mask_scores,
            rendering_scale=est.rendering_scale,
            neighborhood_deg=self.deg, n_neighbors=est.n_neighbors,
        )
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        self._prev_idx_dev = nxt
        self.pending.append(("spec", inputs, packed))

    def _finalize(self, tc: np.ndarray, score: float) -> None:
        self.results.append((tc, float(score)))
        self._prev_rots.append(tc[:3, :3].copy())

    def _drain(self, allowed: int) -> None:
        while len(self.pending) > allowed:
            kind, inputs, handle = self.pending.popleft()
            if kind == "classic":
                tc = np.asarray(handle.tcos)[0]
                self._finalize(tc, float(np.asarray(handle.scores)[0]))
                continue
            p = np.asarray(handle)
            if p[18] > 0.5:  # all-hit: speculation valid
                self.n_spec_hits += 1
                self._cache.touch(p[19:].astype(np.int64))
                self._finalize(p[:16].reshape(4, 4), p[16])
            elif allowed > 0:
                # Replay refills the queue with just-enqueued work; stop
                # draining so those results age `lag` frames before their
                # fetch (finalize_all passes allowed=0 and drains through).
                self.n_replayed += 1
                self._replay(inputs)
                break
            else:
                self.n_replayed += 1
                self._replay(inputs)

    def _replay(self, inputs) -> None:
        """A speculative frame missed: rerun it through the classic path
        (identical host state to the serial loop), then re-enqueue the later
        speculative frames from the corrected pose."""
        est = self.est
        # Restore the prefetch-prediction state the serial loop would hold:
        # _last_prev_rot = the rotation used as prev by the PREVIOUS frame.
        if len(self._prev_rots) == 2:
            est._last_prev_rot[self.key] = self._prev_rots[0]
        else:
            est._last_prev_rot.pop(self.key, None)
        prev = np.eye(4, dtype=np.float64)
        prev[:3, :3] = self.results[-1][0][:3, :3]
        out = est.refine_cached(
            inputs[0], inputs[1], self.mesh, inputs[2], inputs[3], inputs[4],
            jnp.asarray(prev), self.deg, mask_scores=self.mask_scores,
            cache_key=self.key,
        )
        self._note_classic(out)
        # No blocking fetch here: the re-enqueued speculative frames chain
        # from the classic step's device-side grid index; its result
        # finalizes lazily (FIFO, before any frame that could need it).
        rest = list(self.pending)
        self.pending.clear()
        self.pending.append(("classic", inputs, out))
        for _kind, inputs2, _h in rest:
            self._submit_spec(inputs2)


class AutoRefineChain:
    """Fully-autonomous pipelined refine: the cache's slot table, LRU ages
    and eviction live ON DEVICE (fine_cache.DeviceCache), and every frame is
    one self-contained step that serves its own cache misses
    (fine_cache.cached_refine_auto_step). The host keeps NO slot bookkeeping
    — it feeds query crops, chains each step's pose output into the next
    step device-side, and fetches packed results `lag` frames behind.

    The stream step's miss bucket is small (default 8: at 1-3°/frame a
    neighbourhood turns over a few views per frame); a trajectory jump with
    more misses flags ok=0 and the host re-dispatches that frame with the
    full-neighbourhood variant (miss_bucket = n_neighbors, always succeeds)
    and re-enqueues the frames behind it. Results equal the serial
    refine_cached closed loop (every view is an exact function of its grid
    index; eviction order affects only future hit/miss timing)."""

    def __init__(
        self, est: "OnlinePoseEstimator", mesh, cache_key=None, *,
        neighborhood_deg: float = 15.0, mask_scores: bool = False,
        lag: int = 3, miss_bucket: int = 16, adaptive_bucket: bool = False,
        bucket_choices: tuple = (8, 16, 32),
    ):
        from collections import deque

        from freepose_tpu.pipeline.fine_cache import init_device_cache

        self.est = est
        self.mesh = mesh
        self.deg = float(neighborhood_deg)
        self.mask_scores = mask_scores
        self.lag = max(1, lag)
        self.miss_bucket = miss_bucket
        # Adaptive miss bucket (VERDICT r3 #3): the stream step's bucket
        # follows the OBSERVED miss rate instead of staying static — fast
        # motion escalates to the next bucket before overflow forces full
        # re-dispatches; slow motion de-escalates so hit frames keep the
        # smallest (cheapest) program. Each bucket size is its own compiled
        # executable, so choices are few and results stay EXACT: the bucket
        # only caps self-served misses + prefetch padding, never the scores
        # (cached_refine_auto_step's exactness note).
        self.adaptive = bool(adaptive_bucket)
        self.bucket_choices = tuple(sorted(set(
            list(bucket_choices) + [miss_bucket])))
        self._recent_miss: "deque" = deque(maxlen=16)
        self._last_overflow: int | None = None
        self.bucket_switches: list[tuple[int, int]] = []  # (frame, new_bucket)
        self.pending: "deque" = deque()
        self.results: list[tuple[np.ndarray, float]] = []
        self.n_full_redispatch = 0
        self.miss_counts: list[int] = []  # per finalized frame (diagnostics)
        cfg = est.extractor.config
        res = est.renderer.resolution
        grid = res // cfg.patch_size
        self.state = init_device_cache(
            est.fine_cache_capacity, grid * grid, cfg.hidden_size, res,
            est.fine_poses.shape[0], cfg.dtype,
        )
        key = cache_key if cache_key is not None else id(mesh)
        self._mesh_bufs = est._padded_mesh(key, mesh)
        self._prev_pose_dev = None
        self._prev2_pose_dev = None  # pose the previous step used as prev

    def _step(self, inputs, prev_pose, bucket):
        from freepose_tpu.pipeline.fine_cache import cached_refine_auto_step

        est = self.est
        v, c, f, fv = self._mesh_bufs
        # Constant-angular-velocity prefetch extrapolation chains the last
        # two prev poses device-side (prev2 = prev on the first step and
        # after a full re-dispatch — prediction off for that one frame).
        prev2 = self._prev2_pose_dev
        if prev2 is None or prev_pose is not self._prev_pose_dev:
            prev2 = prev_pose
        self.state, packed, pose = cached_refine_auto_step(
            self.state, est.fine_poses, prev_pose, prev2,
            v, c, f, fv, est.renderer.k, est.extractor.params_for(est.feature_layer),
            inputs[0], inputs[1], inputs[2], inputs[3], inputs[4],
            extractor=est.extractor, layer=est.feature_layer,
            settings=est.renderer.settings, pose_chunk=est.renderer.pose_chunk,
            resolution=est.renderer.resolution, mask_scores=self.mask_scores,
            rendering_scale=est.rendering_scale,
            neighborhood_deg=self.deg, n_neighbors=est.n_neighbors,
            miss_bucket=bucket, zoom=est.zoom_renders,
        )
        try:
            packed.copy_to_host_async()
        except Exception:
            pass
        self._prev2_pose_dev = prev_pose
        self._prev_pose_dev = pose
        return packed

    def submit(self, proposal, proposal_mask, k, bbox, est_scale, prev_pose=None):
        inputs = (
            jnp.asarray(proposal), jnp.asarray(proposal_mask),
            jnp.asarray(k, jnp.float32), jnp.asarray(bbox, jnp.float32),
            jnp.asarray(est_scale, jnp.float32),
        )
        if self._prev_pose_dev is None:
            if prev_pose is None:
                raise ValueError("first frame needs prev_pose")
            # Cold cache: the whole neighbourhood misses — full bucket.
            packed = self._step(
                inputs, jnp.asarray(prev_pose, jnp.float32), self.est.n_neighbors
            )
        else:
            if prev_pose is not None:
                raise ValueError("chain is closed-loop; prev_pose only seeds frame 0")
            packed = self._step(inputs, self._prev_pose_dev, self.miss_bucket)
        self.pending.append((inputs, packed))
        self._drain(self.lag)

    def finalize_all(self) -> list[tuple[np.ndarray, float]]:
        self._drain(0)
        return self.results

    def _adapt(self, n_miss: int, overflowed: bool) -> None:
        """Escalate/de-escalate the stream bucket from observed misses."""
        if not self.adaptive:
            return
        self._recent_miss.append(n_miss)
        cur = self.miss_bucket
        if overflowed:
            # An ISOLATED overflow is a trajectory jump, not miss pressure:
            # the full re-dispatch refills the cache and the track
            # re-settles, so escalating would pin a larger (costlier)
            # stream program on settled motion until the 16-frame
            # de-escalation window elapses. Only recurring overflows — a
            # second within 8 drained frames — escalate the bucket.
            now = len(self.results)
            prev_overflow, self._last_overflow = self._last_overflow, now
            if prev_overflow is None or now - prev_overflow > 8:
                return
            bigger = [b for b in self.bucket_choices if b > cur]
            if bigger:
                # Jump straight to a bucket that would have absorbed this
                # frame's misses (else the largest available).
                self.miss_bucket = next((b for b in bigger if b >= n_miss), bigger[-1])
                self.bucket_switches.append((len(self.results), self.miss_bucket))
                self._recent_miss.clear()
            return
        recent = list(self._recent_miss)
        # Near-capacity misses on recent frames: escalate BEFORE an overflow
        # costs a full re-dispatch + requeue of the in-flight frames.
        if len(recent) >= 4 and np.mean(recent[-4:]) > 0.75 * cur:
            bigger = [b for b in self.bucket_choices if b > cur]
            if bigger:
                self.miss_bucket = bigger[0]
                self.bucket_switches.append((len(self.results), self.miss_bucket))
                self._recent_miss.clear()
            return
        # Sustained low misses: drop to the largest smaller bucket that still
        # clears the recent peak with headroom.
        smaller = [b for b in self.bucket_choices if b < cur]
        if len(recent) == self._recent_miss.maxlen and smaller:
            peak = max(recent)
            fit = [b for b in smaller if peak < 0.5 * b or peak == 0]
            if fit:
                self.miss_bucket = fit[-1]
                self.bucket_switches.append((len(self.results), self.miss_bucket))
                self._recent_miss.clear()

    def _drain(self, allowed: int) -> None:
        while len(self.pending) > allowed:
            inputs, handle = self.pending.popleft()
            p = np.asarray(handle)
            if p[17] > 0.5:  # ok
                self.results.append((p[:16].reshape(4, 4), float(p[16])))
                self.miss_counts.append(int(p[18]))
                self._adapt(int(p[18]), overflowed=False)
                continue
            # Trajectory jump: re-dispatch this frame with the full bucket
            # from the last good pose, then re-enqueue the frames behind it.
            self.n_full_redispatch += 1
            self._adapt(int(p[18]), overflowed=True)
            prev = jnp.asarray(self.results[-1][0], jnp.float32)
            packed = self._step(inputs, prev, self.est.n_neighbors)
            rest = list(self.pending)
            self.pending.clear()
            self.pending.append((inputs, packed))
            for inputs2, _h in rest:
                self._step2_requeue(inputs2)
            if allowed > 0:
                break

    def _step2_requeue(self, inputs) -> None:
        packed = self._step(inputs, self._prev_pose_dev, self.miss_bucket)
        self.pending.append((inputs, packed))
