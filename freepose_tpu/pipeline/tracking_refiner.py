"""Render-and-compare track refinement: confidence, 2D-3D correspondences,
point tracking, PnP.

TPU-native counterpart of the reference TrackingRefiner
(src/pipeline/estimators/tracking_refiner.py:19-205):

  * pose confidence — DINOv2 ViT-B patch-cosine between the photo crop and a
    render of the mesh at the estimated pose, masked by render validity
    (:70-90); the crop is roi_align around the projected model points and the
    render uses the crop-adjusted intrinsics (:45-58);
  * inlier counting with a top-quantile confidence threshold (:60-68,92-100);
  * 2D-3D correspondences — project surface samples into the 37×37 patch
    grid and pick, per visible patch, a near-centre surface point closest to
    the camera (:102-158), fully vectorized with segment reductions instead
    of the reference's Python dict binning;
  * point tracking + EPnP + resample heuristic (:160-193).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.camera import crop_bbox_around_projection, update_k_with_crop
from freepose_tpu.io.mesh import TriMesh, pad_mesh
from freepose_tpu.models.cotracker import PointTracker
from freepose_tpu.ops.rasterizer import RasterSettings, rasterize
from freepose_tpu.ops.sampling import resize_area, roi_align
from freepose_tpu.pipeline.pnp import epnp, reprojection_error
from freepose_tpu.pipeline.template_bank import normalize_feats

RES = 518  # DINOv2-B input -> 37x37 patches
PATCH = 14
GRID = RES // PATCH  # 37


@partial(jax.jit, static_argnames=())
def confidence_map(photo_feats: jax.Array, render_feats: jax.Array, render_mask37: jax.Array) -> jax.Array:
    """[G², D] x2 (normalized) + [G, G] bool -> [G, G] cosine confidence."""
    cos = jnp.sum(photo_feats * render_feats, axis=-1).reshape(GRID, GRID)
    return cos * render_mask37


@partial(jax.jit, static_argnames=("size",))
def _slice_chunk(frames: jax.Array, start: jax.Array, size: int) -> jax.Array:
    """Dynamic-start chunk slice of a device-resident video: ONE compiled
    program per (buffer shape, chunk size), the start index is data."""
    return jax.lax.dynamic_slice_in_dim(frames, start, size, axis=0)


@partial(jax.jit, static_argnames=("size",))
def _slice_chunk_chw(frames: jax.Array, start: jax.Array, size: int) -> jax.Array:
    """Chunk slice of an HBM-staged [B, H, W, 3] video transposed to the
    model layout [size, 3, H, W] INSIDE the program — an eager transpose of
    the whole staged buffer would materialize a second full-video copy."""
    chunk = jax.lax.dynamic_slice_in_dim(frames, start, size, axis=0)
    return chunk.transpose(0, 3, 1, 2)


@partial(jax.jit, static_argnames=("top_quantile",))
def quantile_threshold(conf: jax.Array, top_quantile: float = 0.2) -> jax.Array:
    """Threshold keeping the top `top_quantile` of POSITIVE confidences
    (reference _get_threshold_for_confidence histogram walk, :60-68).

    Jitted, and insensitive to NONPOSITIVE padding: callers with
    length-varying inputs (per-video confidence stacks) pad with any value
    <= 0 to a static bucket so one executable serves every video length."""
    flat = conf.reshape(-1)
    pos = flat > 0
    big = jnp.float32(-1e9)
    vals = jnp.where(pos, flat, big)
    # quantile over positives: sort desc, index = top_quantile * n_pos
    order = jnp.sort(vals)[::-1]
    n_pos = jnp.sum(pos)
    idx = jnp.clip((top_quantile * n_pos).astype(jnp.int32), 0, flat.shape[0] - 1)
    return order[idx]


@dataclasses.dataclass
class TrackingRefiner:
    """feature_fn: DINOv2-B patch extractor (518² -> [B, 37², D])."""

    feature_fn: object
    tracker: PointTracker
    max_vertices: int = 8192
    max_faces: int = 16384
    n_surface_samples: int = 10000
    settings: RasterSettings = dataclasses.field(
        default_factory=lambda: RasterSettings(resolution=RES, tile=37, max_faces_per_tile=256)
    )
    # Optional DinoFeatureExtractor: when set, pose_confidence_batch fuses
    # crop + render + featurize + cosine into ONE program (params enter as
    # jit arguments) instead of ~6 eager dispatches per chunk — each dispatch
    # costs a host round trip (same pattern as OnlinePoseEstimator's fused
    # refine, and the same reason).
    extractor: object = None
    feature_layer: int | None = None

    # ---------------------------------------------------------------- #
    def _crop_and_k(self, image: jax.Array, mesh_pts: jax.Array, k: jax.Array, pose: jax.Array):
        """Crop the photo around the projected model and adjust K
        (reference _crop_image, :45-58)."""
        bbox = crop_bbox_around_projection(pose[None], mesh_pts, k, RES, RES, lamb=1.4)[0]
        crop = roi_align(image, bbox[None], RES, RES, sampling_ratio=2)[0]
        new_k = update_k_with_crop(k, bbox[None], RES, RES)[0]
        return crop, bbox, new_k

    def _padded(self, mesh: TriMesh, scale: float = 1.0):
        """pad_mesh result cached per (mesh, scale) — re-uploading vertex
        data per frame costs a host->device transfer each call. The entry
        stores the mesh object itself (identity-checked): a bare id() key
        could alias a recycled address after GC. Bounded to the last few
        meshes (device buffers are ~300 KB each)."""
        cache = getattr(self, "_pad_cache", None)
        if cache is None:
            cache = self._pad_cache = {}
        key = (id(mesh), scale)
        entry = cache.get(key)
        if entry is None or entry[0] is not mesh:
            v, c, f, valid = pad_mesh(mesh, self.max_vertices, self.max_faces)
            entry = (mesh, tuple(jnp.asarray(x) for x in (v * scale, c, f, valid)))
            cache[key] = entry
            while len(cache) > 8:
                cache.pop(next(iter(cache)))
        return entry[1]

    def _render(self, mesh: TriMesh, k: jax.Array, pose: jax.Array, scale: float = 1.0):
        v, c, f, valid = self._padded(mesh, scale)
        rgb, depth = rasterize(v, c, f, valid, pose[None], k, self.settings)
        return rgb[0], depth[0]

    def _patch_feats(self, images: jax.Array) -> jax.Array:
        """[B, 3, RES, RES] -> [B, G², D] L2-normalized patch features."""
        return normalize_feats(self.feature_fn(images))

    # ---------------------------------------------------------------- #
    @staticmethod
    def _to_float(frames: jax.Array) -> jax.Array:
        """uint8 frames normalize ON DEVICE: uploading uint8 moves 4× fewer
        bytes host->device than pre-divided float32 (the video-length frame
        stack dominates this stage's transfer volume)."""
        frames = jnp.asarray(frames)
        if frames.dtype == jnp.uint8:
            frames = frames.astype(jnp.float32) / 255.0
        return frames

    def pose_confidence(self, mesh: TriMesh, photo: jax.Array, k: jax.Array, pose: jax.Array) -> np.ndarray:
        """[3, H, W] photo (float in [0,1] or uint8) -> [37, 37] confidence
        (reference :70-90)."""
        photo = self._to_float(photo)
        pts = jnp.asarray(mesh.sample_surface(100, seed=42))
        crop, _, new_k = self._crop_and_k(photo, pts, k, pose)
        render_rgb, render_depth = self._render(mesh, new_k, pose)
        mask37 = resize_area((render_depth > 0).astype(jnp.float32), (GRID, GRID)) > 0.5
        feats = self._patch_feats(
            jnp.stack([crop, render_rgb.transpose(2, 0, 1)])
        )
        return np.asarray(confidence_map(feats[0], feats[1], mask37))

    def pose_confidence_batch(
        self, mesh: TriMesh, frames: jax.Array, k: jax.Array, poses: jax.Array,
        fetch: bool = True,
    ):
        """Batched pose_confidence: [B, 3, H, W] photos + [B, 4, 4] poses ->
        [B, 37, 37]. One crop/render/feature batch instead of B serial
        per-frame chains (the reference's dominant smooth_poses cost,
        tracking_refiner.py:92-100 — render + 2 ViT-B per frame). Frames may
        be uint8 (normalized on device after the cheap upload). fetch=False
        returns the DEVICE array (callers enqueue many chunks back-to-back
        and fetch once — a per-chunk blocking fetch costs a tunnel round trip
        and stalls the next chunk's dispatch)."""
        pts = jnp.asarray(mesh.sample_surface(100, seed=42))
        v, c, f, valid = self._padded(mesh)
        if self.extractor is not None:
            out = _confidence_batch_fused(
                v, c, f, valid, pts, jnp.asarray(frames), k, poses,
                self.extractor.params_for(self.feature_layer), self.settings, self.extractor,
                self.feature_layer,
            )
            return np.asarray(out) if fetch else out
        frames = self._to_float(frames)
        bboxes = crop_bbox_around_projection(poses, pts, k, RES, RES, lamb=1.4)
        crops = jax.vmap(
            lambda img, bb: roi_align(img, bb[None], RES, RES, sampling_ratio=2)[0]
        )(frames, bboxes)
        new_ks = update_k_with_crop(k, bboxes, RES, RES)  # [B, 3, 3]
        render_rgb, render_depth = rasterize(v, c, f, valid, poses, new_ks, self.settings)
        mask37 = (
            resize_area((render_depth > 0).astype(jnp.float32), (GRID, GRID)) > 0.5
        )  # [B, G, G]
        b = frames.shape[0]
        feats = self._patch_feats(
            jnp.concatenate([crops, render_rgb.transpose(0, 3, 1, 2)])
        )
        cos = jnp.sum(feats[:b] * feats[b:], axis=-1).reshape(b, GRID, GRID)
        out = cos * mask37
        return np.asarray(out) if fetch else out

    def pose_confidence_batch_sharded(
        self, mesh: TriMesh, frames: jax.Array, k: jax.Array, poses: jax.Array,
        device_mesh, axis: str = "data", fetch: bool = True,
    ):
        """pose_confidence_batch with the frame batch sharded over a device
        mesh axis: each chip crops/renders/featurizes B/n_dev frames (the
        whole per-frame chain is frame-local, so the only collective is the
        output gather). This is the smooth stage's scaling axis — at 41
        ms/frame it is the second-largest e2e stage and is embarrassingly
        parallel over frames. Parity with pose_confidence_batch is tested on
        the 8-device CPU mesh."""
        if self.extractor is None:
            raise ValueError("sharded confidence requires `extractor` (fused path)")
        if frames.shape[0] % device_mesh.shape[axis]:
            raise ValueError(
                f"batch {frames.shape[0]} must divide over the '{axis}' axis "
                f"({device_mesh.shape[axis]} devices)")
        pts = jnp.asarray(mesh.sample_surface(100, seed=42))
        v, c, f, valid = self._padded(mesh)
        out = _confidence_batch_fused_sharded(
            v, c, f, valid, pts, jnp.asarray(frames), k, jnp.asarray(poses),
            self.extractor.params_for(self.feature_layer), self.settings,
            self.extractor, self.feature_layer, device_mesh, axis,
        )
        return np.asarray(out) if fetch else out

    def correspondences_batch(
        self, mesh: TriMesh, k: jax.Array, poses: jax.Array, seed: int = 0,
        device_mesh=None, axis: str = "data",
    ):
        """compute_2d3d_correspondences for a BATCH of interval-start poses
        in one program: one batched render over all starts, then the patch
        binning vmapped per start — [I, G², 2] query px, [I, G², 3] surface
        points, [I, G²] valid. With `device_mesh`, the start axis shards over
        `axis` (each chip renders+bins its own intervals)."""
        pts100 = jnp.asarray(mesh.sample_surface(100, seed=42))
        surf = jnp.asarray(mesh.sample_surface(self.n_surface_samples, seed=seed))
        v, c, f, fv = self._padded(mesh, 0.8)
        args = (v, c, f, fv, pts100, surf, jnp.asarray(k, jnp.float32),
                jnp.asarray(poses, jnp.float32))
        if device_mesh is None:
            return _correspondences_batch_jit(*args, settings=self.settings)
        if poses.shape[0] % device_mesh.shape[axis]:
            raise ValueError(
                f"interval batch {poses.shape[0]} must divide over the "
                f"'{axis}' axis ({device_mesh.shape[axis]} devices)")
        return _correspondences_batch_sharded(
            *args, settings=self.settings, device_mesh=device_mesh, axis=axis)

    def n_inliers_per_pose(
        self, mesh: TriMesh, frames, k: jax.Array, poses: np.ndarray,
        chunk: int = 8, n_valid: int | None = None, channels_last: bool = False,
        device_mesh=None, mesh_axis: str = "data",
    ):
        """Confidence + inlier count for every frame (reference :92-100).

        `frames` is [T, 3, H, W] host np (chunks upload with async prefetch;
        the NEXT chunk's device_put is issued before blocking on the current
        chunk's tiny result fetch) or a DEVICE jax array at a bucketed length
        (pass `n_valid` = true frame count): chunks then slice on device via
        ONE jitted dynamic_slice — zero per-chunk host uploads, and programs
        key on the bucket, not the video length. Tail chunks pad to `chunk`
        by repeating the last frame/pose (result rows sliced off) — a partial
        tail would recompile the fused program at a new batch shape.

        channels_last=True (device frames only) accepts the HBM-staged
        [B, H, W, 3] layout and transposes each chunk INSIDE the slice
        program — an eager transpose of the staged buffer would materialize a
        second full-video copy, and the chunk program would differ from the
        one StreamingInliers compiles."""
        on_device = isinstance(frames, jax.Array)
        if channels_last and not on_device:
            raise ValueError("channels_last applies to device-staged frames")
        if on_device and n_valid is None:
            raise ValueError(
                "n_inliers_per_pose: device frames are bucket-padded — pass "
                "n_valid (the true frame count); the padded length would "
                "silently count duplicate padding frames")
        n = n_valid if on_device else len(frames)

        def padded(arr, i):
            part = arr[i : i + chunk]
            if len(part) < chunk:
                part = np.concatenate([part, np.repeat(part[-1:], chunk - len(part), axis=0)])
            return part

        poses = np.asarray(poses)
        if on_device:
            if frames.shape[0] % chunk:
                raise ValueError(
                    f"device frames length {frames.shape[0]} must be a "
                    f"multiple of chunk={chunk} (stage to a frame bucket)")
            slicer = _slice_chunk_chw if channels_last else _slice_chunk
            get_chunk = lambda i: slicer(frames, jnp.int32(i), chunk)
        else:
            frames = np.asarray(frames)
            get_chunk = lambda i: jax.device_put(padded(frames, i))
        nxt = get_chunk(0)
        outs = []
        for i in range(0, n, chunk):
            cur = nxt
            if i + chunk < n:
                nxt = get_chunk(i + chunk)
            # Enqueue every chunk's program; fetch ONCE after the loop (each
            # result starts its host copy async) — a per-chunk blocking fetch
            # would add a tunnel round trip per chunk and stall dispatch.
            if device_mesh is not None:
                out = self.pose_confidence_batch_sharded(
                    mesh, cur, k, jnp.asarray(padded(poses, i)),
                    device_mesh, axis=mesh_axis, fetch=False)
            else:
                out = self.pose_confidence_batch(
                    mesh, cur, k, jnp.asarray(padded(poses, i)), fetch=False)
            try:
                out.copy_to_host_async()
            except Exception:
                pass
            outs.append(out)
        confs = np.concatenate([np.asarray(o)[: n - i] for i, o in
                                zip(range(0, n, chunk), outs)])
        # Static frame bucket (pad with -inf, excluded by positivity) so ONE
        # compiled quantile program serves every video length — a fresh flat
        # shape per video length costs a remote compile on TPU sessions.
        # Device frames are already staged at a bucket multiple: key on the
        # BUFFER length so a short warm-up prefix of a long staged video
        # compiles the exact program the full pass runs.
        from freepose_tpu.datasets.video import FRAME_BUCKET

        bucket = frames.shape[0] if on_device else -(-n // FRAME_BUCKET) * FRAME_BUCKET
        padded_confs = np.full((bucket, *confs.shape[1:]), -1e9, np.float32)
        padded_confs[:n] = confs
        thr = float(quantile_threshold(jnp.asarray(padded_confs)))
        return (confs > thr).sum(axis=(1, 2)), thr

    # ---------------------------------------------------------------- #
    def compute_2d3d_correspondences(
        self, mesh: TriMesh, photo: jax.Array, k: jax.Array, pose: jax.Array,
        mask: jax.Array | None = None, seed: int = 0, fetch: bool = True,
    ):
        """-> (query_points [G², 2] full-image px, surface_points [G², 3]
        object frame, valid [G²]). Padded to the 37² patch grid. One fused
        program (correspondences never read `photo` pixels — the parameter
        stays for the reference API shape, tracking_refiner.py:132-158).
        fetch=False keeps the results on DEVICE (pipelined interval callers
        enqueue every interval's chain before fetching anything)."""
        pts100 = jnp.asarray(mesh.sample_surface(100, seed=42))
        surf = jnp.asarray(mesh.sample_surface(self.n_surface_samples, seed=seed))
        v, c, f, fv = self._padded(mesh, 0.8)  # reference's 0.8 shrink, :140-143
        query, surface_points, valid = _correspondences_jit(
            v, c, f, fv, pts100, surf, jnp.asarray(k, jnp.float32),
            jnp.asarray(pose, jnp.float32),
            jnp.zeros((2, 2)) if mask is None else jnp.asarray(mask, jnp.float32),
            settings=self.settings, has_mask=mask is not None,
        )
        if not fetch:
            return query, surface_points, valid
        return np.asarray(query), np.asarray(surface_points), np.asarray(valid)

    # ---------------------------------------------------------------- #
    def track_frames(self, frames: np.ndarray, query_points: np.ndarray, query_frame: int = 0):
        """frames [T, H, W, 3]; queries [N, 2] -> (tracks [T, N, 2],
        vis [T, N]) (reference _track_frames, :160-166)."""
        return self.tracker.track(frames, query_points, query_frame)

    @staticmethod
    def _pnp_context():
        """EPnP solves on the HOST CPU backend when the session's default
        platform is an accelerator: the solve is sub-millisecond SVD work on
        ≤37² points, while its TPU lowering takes tens of minutes to compile
        (measured: vmapped batch aborted at 15 min). The reference also
        solves PnP on CPU (cv2.solvePnP, tracking_refiner.py:168-179)."""
        import contextlib

        if jax.default_backend() in ("tpu", "axon", "gpu"):
            cpus = jax.local_devices(backend="cpu")
            if cpus:
                return jax.default_device(cpus[0])
        return contextlib.nullcontext()

    def compute_pnp(self, image_pts: np.ndarray, object_pts: np.ndarray, valid: np.ndarray, k: jax.Array):
        # Host numpy first — see compute_pnp_batch's transfer note.
        image_pts, object_pts = np.asarray(image_pts), np.asarray(object_pts)
        valid, k = np.asarray(valid), np.asarray(k)
        with self._pnp_context():
            pose = epnp(
                jnp.asarray(object_pts, jnp.float32), jnp.asarray(image_pts, jnp.float32),
                jnp.asarray(k, jnp.float32), jnp.asarray(valid),
            )
            return np.asarray(pose)

    def compute_pnp_batch(
        self, image_pts: np.ndarray, object_pts: np.ndarray, valid: np.ndarray, k: jax.Array
    ) -> np.ndarray:
        """EPnP for every frame of a tracked interval in ONE dispatch:
        image_pts [T, N, 2] (the CoTracker output), object_pts [N, 3] shared,
        valid [T, N] per-frame visibility -> [T, 4, 4]. Replaces the
        reference's per-frame cv2.solvePnP loop (smooth_poses_video.py:162-192)
        — per-frame dispatches cost a host round trip each. Runs on the host
        CPU backend under accelerator sessions (see _pnp_context).

        Inputs are pulled to HOST numpy BEFORE entering the CPU context:
        converting an accelerator array inside it issues a device->host
        transfer per argument (measured ~110 ms/interval through the remote
        tunnel vs ~5 ms of actual solve compute). Callers that prefetched
        (copy_to_host_async) pay nothing here."""
        image_pts = np.asarray(image_pts)
        object_pts = np.asarray(object_pts)
        valid = np.asarray(valid)
        k = np.asarray(k)
        with self._pnp_context():
            return np.asarray(_epnp_batch(
                jnp.asarray(object_pts, jnp.float32), jnp.asarray(image_pts, jnp.float32),
                jnp.asarray(k, jnp.float32), jnp.asarray(valid),
            ))

    def compute_pnp_or_need_resample(
        self, mesh: TriMesh, photo: jax.Array, tracks: np.ndarray, visibility: np.ndarray,
        object_pts: np.ndarray, valid: np.ndarray, k: jax.Array,
    ):
        """PnP from visible tracked points; resample if the re-generated
        correspondences have drifted (reference :181-193)."""
        vis_valid = valid & visibility
        if vis_valid.sum() < 0.5 * max(valid.sum(), 1):
            return True, None
        pose = self.compute_pnp(tracks, object_pts, vis_valid, k)
        new_query, _, new_valid = self.compute_2d3d_correspondences(mesh, photo, k, jnp.asarray(pose))
        old_pts = tracks[vis_valid]
        new_pts = new_query[new_valid]
        if len(new_pts) == 0 or len(old_pts) == 0:
            return True, pose
        d_old = np.sqrt(((new_pts[:, None] - old_pts[None]) ** 2).sum(-1)).min(1)
        d_new = np.zeros(len(new_pts))
        for i in range(len(new_pts)):
            others = np.delete(new_pts, i, axis=0)
            if len(others):
                d_new[i] = np.sqrt(((new_pts[i] - others) ** 2).sum(-1)).min()
        return bool(np.median(d_old) > np.median(d_new)), pose

    @staticmethod
    def get_query_frames(n_inliers: np.ndarray, n_reference: int = 8) -> np.ndarray:
        """Peak-pick reference frames with suppression (reference :195-205)."""
        arr = n_inliers.astype(np.float64).copy()
        span = max(int(len(arr) / n_reference / 2), 1)
        chosen = []
        while len(chosen) < min(n_reference, len(arr)):
            idx = int(np.argmax(arr))
            chosen.append(idx)
            arr[max(idx - span, 0) : idx + span + 1] = -1
        return np.sort(np.asarray(chosen))


class StreamingInliers:
    """Incremental n_inliers_per_pose over an HBM-staged video.

    The serial smooth pass scores every frame's confidence AFTER the refine
    loop finishes (reference tracking_refiner.py:92-100 runs as its own
    stage). But each frame's confidence depends only on THAT frame's pose, so
    the chunks can dispatch as soon as the refine chain finalizes their poses
    — the confidence compute then fills the refine loop's host-stall windows
    (dispatch gaps + result-fetch round trips) instead of serializing after
    it. `add(t, pose)` feeds poses in any order; a chunk dispatches when all
    its frames' poses are known; `finalize()` fetches everything and returns
    (inliers [n], threshold) identical to n_inliers_per_pose (same fused
    program, same bucketed quantile).
    """

    def __init__(self, refiner: TrackingRefiner, mesh: TriMesh, staged, k: jax.Array,
                 chunk: int = 8):
        from freepose_tpu.datasets.video import StagedVideo

        if not isinstance(staged, StagedVideo):
            raise TypeError("StreamingInliers requires an HBM StagedVideo")
        if staged.frames.shape[0] % chunk:
            raise ValueError("staged bucket must be a multiple of chunk")
        self.refiner = refiner
        self.mesh = mesh
        self.staged = staged
        self.k = jnp.asarray(k, jnp.float32)
        self.chunk = chunk
        self.n = staged.n
        self._poses: dict[int, np.ndarray] = {}
        self._outs: list[jax.Array] = []  # per-chunk [chunk, 37, 37] device
        self._next = 0  # first frame of the next chunk to dispatch

    def warmup(self) -> None:
        """Compile the chunk program before any timed region (results unused:
        identity poses on the first chunk's frames)."""
        if self._next == 0 and not self._outs:
            cur = _slice_chunk_chw(self.staged.frames, jnp.int32(0), self.chunk)
            out = self.refiner.pose_confidence_batch(
                self.mesh, cur, self.k,
                jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (self.chunk, 1, 1)),
                fetch=False)
            jax.block_until_ready(out)

    def add(self, t: int, pose: np.ndarray) -> None:
        self._poses[t] = np.asarray(pose)
        self._flush()

    def _flush(self) -> None:
        while self._next < self.n:
            i = self._next
            hi = min(i + self.chunk, self.n)
            if any(j not in self._poses for j in range(i, hi)):
                return
            # Tail chunks repeat the last pose (result rows sliced off) so
            # the one compiled chunk program serves the tail; the staged
            # buffer already repeat-pads its frames.
            idxs = [min(j, hi - 1) for j in range(i, i + self.chunk)]
            poses = jnp.asarray(np.stack([self._poses[j] for j in idxs]), jnp.float32)
            cur = _slice_chunk_chw(self.staged.frames, jnp.int32(i), self.chunk)
            out = self.refiner.pose_confidence_batch(self.mesh, cur, self.k, poses, fetch=False)
            try:
                out.copy_to_host_async()
            except Exception:
                pass
            self._outs.append(out)
            self._next = hi

    def finalize(self):
        """-> (inliers [n] int, threshold float). All poses must be fed."""
        if self._next < self.n:
            missing = [j for j in range(self._next, self.n) if j not in self._poses]
            raise ValueError(f"StreamingInliers: poses missing for frames {missing[:5]}")
        confs = np.concatenate(
            [np.asarray(o)[: self.n - i] for i, o in
             zip(range(0, self.n, self.chunk), self._outs)])
        bucket = self.staged.frames.shape[0]
        padded = np.full((bucket, *confs.shape[1:]), -1e9, np.float32)
        padded[: self.n] = confs
        thr = float(quantile_threshold(jnp.asarray(padded)))
        return (confs > thr).sum(axis=(1, 2)), thr


@jax.jit
def _epnp_batch(object_pts: jax.Array, image_pts: jax.Array, k: jax.Array, valid: jax.Array):
    """vmap EPnP over the frame axis: [N, 3], [T, N, 2], [3, 3], [T, N]."""
    return jax.vmap(lambda ip, va: epnp(object_pts, ip, k, va))(image_pts, valid)


@partial(jax.jit, static_argnames=("settings", "extractor", "layer"))
def _confidence_batch_fused(
    v, c, f, fv, pts, frames, k, poses, fe_params, settings, extractor, layer
):
    """pose_confidence_batch as ONE program: crop (roi_align) + per-pose-K
    render + 37×37 mask + DINOv2 features + masked cosine. Extractor params
    enter as arguments (never closed over — see models/dinov2._extract_jit)."""
    from freepose_tpu.models.dinov2 import _extract_jit

    if frames.dtype == jnp.uint8:
        frames = frames.astype(jnp.float32) / 255.0
    bboxes = crop_bbox_around_projection(poses, pts, k, RES, RES, lamb=1.4)
    crops = jax.vmap(
        lambda img, bb: roi_align(img, bb[None], RES, RES, sampling_ratio=2)[0]
    )(frames, bboxes)
    new_ks = update_k_with_crop(k, bboxes, RES, RES)
    rgb, depth = rasterize(v, c, f, fv, poses, new_ks, settings)
    mask37 = resize_area((depth > 0).astype(jnp.float32), (GRID, GRID)) > 0.5
    b = frames.shape[0]
    imgs = jnp.concatenate([crops, rgb.transpose(0, 3, 1, 2)])
    feats = normalize_feats(_extract_jit.__wrapped__(extractor, fe_params, imgs, layer, "patch"))
    cos = jnp.sum(feats[:b] * feats[b:], axis=-1).reshape(b, GRID, GRID)
    return cos * mask37


@partial(jax.jit, static_argnames=("settings", "extractor", "layer", "device_mesh", "axis"))
def _confidence_batch_fused_sharded(
    v, c, f, fv, pts, frames, k, poses, fe_params, settings, extractor, layer,
    device_mesh, axis,
):
    """_confidence_batch_fused with the frame batch sharded over `axis`:
    the per-frame chain has no cross-frame dependency, so each shard runs
    the identical local program and only the output gathers."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(v_, c_, f_, fv_, pts_, fr, k_, po, fp):
        return _confidence_batch_fused.__wrapped__(
            v_, c_, f_, fv_, pts_, fr, k_, po, fp, settings, extractor, layer)

    fn = shard_map(
        local, mesh=device_mesh,
        in_specs=(P(), P(), P(), P(), P(), P(axis), P(), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(v, c, f, fv, pts, frames, k, poses, fe_params)


@partial(jax.jit, static_argnames=("settings", "has_mask"))
def _correspondences_jit(
    v, c, f, fv, pts100, surf, k, pose, mask, settings, has_mask
):
    """Fused 2D-3D correspondence generation: crop-bbox + shrunk render +
    projection + near-centre/nearest-to-camera patch binning, one program."""
    bbox = crop_bbox_around_projection(pose[None], pts100, k, RES, RES, lamb=1.4)[0]
    new_k = update_k_with_crop(k, bbox[None], RES, RES)[0]
    _, depth_small = rasterize(v, c, f, fv, pose[None], new_k, settings)
    mask37 = resize_area((depth_small[0] > 0).astype(jnp.float32), (GRID, GRID)) > 0.5
    if has_mask:
        crop_mask = roi_align(mask[None], bbox[None], RES, RES)[0, 0]
        mask37_crop = resize_area(crop_mask, (GRID, GRID)) > 0.5
        combined = mask37 & mask37_crop
        mask37 = jnp.where(jnp.sum(combined) >= 4, combined, mask37)

    return _bin_surface_to_patches(surf, pose, new_k, mask37, bbox)


def _bin_surface_to_patches(surf, pose, new_k, mask37, bbox):
    """Project surface samples into the 37x37 crop grid and pick, per patch,
    a near-centre point closest to the camera (reference :102-158; shared by
    the single-pose and batched correspondence programs)."""
    cam = surf @ pose[:3, :3].T + pose[:3, 3]
    uvw = cam @ new_k.T
    uv = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 1e-6)
    patch_xy = jnp.floor(uv / PATCH).astype(jnp.int32)
    in_grid = (
        (patch_xy[:, 0] >= 0) & (patch_xy[:, 0] < GRID)
        & (patch_xy[:, 1] >= 0) & (patch_xy[:, 1] < GRID) & (cam[:, 2] > 1e-4)
    )
    pid = jnp.where(in_grid, patch_xy[:, 1] * GRID + patch_xy[:, 0], GRID * GRID)

    # Near-centre preference then nearest-to-camera: single sort key
    # (coarse centre-distance bins, depth within a bin), per-patch argmin via
    # segment-min over packed keys.
    center_off = uv / PATCH - jnp.floor(uv / PATCH) - 0.5
    cdist = jnp.sum(center_off * center_off, axis=-1)  # [N], 0..0.5
    cbin = jnp.clip((cdist * 16).astype(jnp.int32), 0, 15).astype(jnp.float32)
    key = cbin * 100.0 + jnp.clip(cam[:, 2], 0.0, 99.0)
    key = jnp.where(in_grid, key, jnp.inf)
    order = jnp.argsort(key)  # ascending: best points first
    pid_sorted = pid[order]
    # First occurrence of each patch id in the sorted order = winner.
    seg_min_pos = jnp.full((GRID * GRID + 1,), surf.shape[0], jnp.int32)
    positions = jnp.arange(surf.shape[0], dtype=jnp.int32)
    seg_min_pos = seg_min_pos.at[pid_sorted].min(positions)
    winner_sorted_pos = seg_min_pos[: GRID * GRID]  # [G²]
    has_point = winner_sorted_pos < surf.shape[0]
    winner_idx = order[jnp.clip(winner_sorted_pos, 0, surf.shape[0] - 1)]

    surface_points = surf[winner_idx]
    valid = has_point & mask37.reshape(-1)

    # Patch centres back to full-image pixels (reference :154-158).
    gx = jnp.arange(GRID * GRID) % GRID
    gy = jnp.arange(GRID * GRID) // GRID
    pts_crop = jnp.stack([gx, gy], axis=-1).astype(jnp.float32) * PATCH + PATCH * 0.5
    x1, y1, x2, y2 = bbox
    query = pts_crop / RES * jnp.stack([x2 - x1, y2 - y1]) + jnp.stack([x1, y1])
    return query, surface_points, valid


def _correspondences_batch_core(v, c, f, fv, pts100, surf, k, poses, settings):
    """Batched correspondences: ONE batched render over all interval starts
    (the rasterizer natively batches poses — no vmap over the Pallas kernel),
    then the pure-jnp patch binning vmapped per start."""
    bboxes = crop_bbox_around_projection(poses, pts100, k, RES, RES, lamb=1.4)
    new_ks = update_k_with_crop(k, bboxes, RES, RES)  # [I, 3, 3]
    _, depths = rasterize(v, c, f, fv, poses, new_ks, settings)
    mask37 = resize_area((depths > 0).astype(jnp.float32), (GRID, GRID)) > 0.5
    return jax.vmap(
        lambda po, nk, m37, bb: _bin_surface_to_patches(surf, po, nk, m37, bb)
    )(poses, new_ks, mask37, bboxes)


@partial(jax.jit, static_argnames=("settings",))
def _correspondences_batch_jit(v, c, f, fv, pts100, surf, k, poses, settings):
    return _correspondences_batch_core(v, c, f, fv, pts100, surf, k, poses, settings)


@partial(jax.jit, static_argnames=("settings", "device_mesh", "axis"))
def _correspondences_batch_sharded(
    v, c, f, fv, pts100, surf, k, poses, settings, device_mesh, axis
):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(v_, c_, f_, fv_, p100, sf, k_, po):
        return _correspondences_batch_core(v_, c_, f_, fv_, p100, sf, k_, po, settings)

    fn = shard_map(
        local, mesh=device_mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(v, c, f, fv, pts100, surf, k, poses)
