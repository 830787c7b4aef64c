"""Track-and-refine a coarse video pose track (CoTracker+PnP + SE(3) smooth).

CLI counterpart of reference scripts/smooth_poses_video.py: score every
frame's coarse pose by render-and-compare inliers, walk 12-frame intervals
outward from the best frame, inside each interval generate 2D-3D
correspondences, track them, and solve PnP per frame (resampling
correspondences when they drift); keep the coarse translations and smooth
rotations/translations over the track -> `{video}-tracked.csv`.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.camera import default_video_intrinsics
from freepose_tpu.geometry.se3 import smooth_transforms
from freepose_tpu.io.bop_csv import PoseResult, read_results_csv, write_results_csv
from freepose_tpu.io.mesh import load_obj
from freepose_tpu.models.cotracker import PointTracker
from freepose_tpu.pipeline.tracking_refiner import TrackingRefiner
from scripts.common import load_dino_extractor
from scripts.dino_inference_video import load_frames


def predict_interval(refiner, mesh, frames, k, start_pose, start_idx, indices):
    """Track correspondences from `start_idx` across `indices` and PnP each
    frame (reference smooth_poses_video.py:129-192)."""
    photo0 = jnp.asarray(frames[start_idx].transpose(2, 0, 1) / 255.0)
    query, surface, valid = refiner.compute_2d3d_correspondences(mesh, photo0, k, jnp.asarray(start_pose))
    if valid.sum() < 4:
        return {i: start_pose for i in indices}
    sub = frames[[min(max(i, 0), len(frames) - 1) for i in indices]].astype(np.float32) / 255.0
    local_start = indices.index(start_idx)
    tracks, vis = refiner.track_frames(sub, query[valid], query_frame=local_start)
    # One vmapped EPnP dispatch for the whole interval (the reference solves
    # cv2.solvePnP per frame, smooth_poses_video.py:162-192).
    poses = refiner.compute_pnp_batch(tracks, surface[valid], vis, k)
    return {frame_idx: poses[li] for li, frame_idx in enumerate(indices)}


def _batched_intervals(
    refiner, mesh, frames_dev, k, poses, starts, step, n, cap,
    refined: dict, device_mesh=None, mesh_axis: str = "data",
) -> None:
    """All intervals as ONE batched program chain: batched correspondences
    render + top-cap selection + batched ZNCC chains + one fetch set +
    host EPnP. This is the MULTI-CHIP vehicle: with `device_mesh` the
    interval axis shards over `mesh_axis` (each chip renders and scans its
    own intervals). On a single device it is measured SLOWER than the
    pipelined per-interval loop (22.8 vs 5.0 ms/frame warm on one v5e —
    the monolithic vmapped chain program schedules worse than 9 pipelined
    dispatches), so smooth_track only defaults to it when a mesh is given.
    The start batch pads to a static bucket derived from the frame bucket
    (and the mesh axis) with repeats of the last start; padded rows are
    discarded. Numerics match the single-device pipelined path: the
    selection comparator, chain and masked EPnP are identical per
    interval."""
    import math

    n_dev = device_mesh.shape[mesh_axis] if device_mesh is not None else 1
    # The interval batch pads to a STATIC size derived from the staged frame
    # BUCKET (max starts any video of this bucket can have, rounded up to the
    # mesh axis): one compiled program serves every video length <= the
    # bucket and any best-frame phase — a per-start-count shape would cost a
    # fresh remote compile per video. Padded rows repeat the last start and
    # are discarded.
    i_max = int(frames_dev.shape[0]) // step + 2
    pad_to = math.lcm(4, n_dev)
    i_bucket = -(-i_max // pad_to) * pad_to
    if len(starts) > i_bucket:
        raise ValueError(f"{len(starts)} interval starts > bucket {i_bucket}")
    starts_pad = list(starts) + [starts[-1]] * (i_bucket - len(starts))
    poses_b = jnp.asarray(np.stack([poses[s] for s in starts_pad]), jnp.float32)
    query_b, surface_b, valid_b = refiner.correspondences_batch(
        mesh, k, poses_b, device_mesh=device_mesh, axis=mesh_axis)
    g2 = valid_b.shape[1]
    order_b = jnp.argsort(
        jnp.where(valid_b, 0, g2 + 1) + jnp.arange(g2)[None], axis=1
    )[:, : min(cap, g2)]
    qs_b = jnp.take_along_axis(query_b, order_b[..., None], axis=1)
    ss_b = jnp.take_along_axis(surface_b, order_b[..., None], axis=1)
    vs_b = jnp.take_along_axis(valid_b, order_b, axis=1)
    idx_rows = []
    for s in starts_pad:
        idxs = list(range(s, min(s + step, n)))
        idx_rows.append([min(max(i, 0), n - 1) for i in idxs] + [idxs[-1]] * (step - len(idxs)))
    subs = jnp.take(frames_dev, jnp.asarray(np.asarray(idx_rows, np.int32)), axis=0)
    tracks_b, scores_b = refiner.tracker.track_device_batch(
        subs, qs_b, device_mesh=device_mesh, axis=mesh_axis)
    for a in (tracks_b, scores_b, vs_b, ss_b):
        try:
            a.copy_to_host_async()
        except Exception:
            pass
    tracks_np = np.asarray(tracks_b)
    scores_np = np.asarray(scores_b)
    vs_np_b = np.asarray(vs_b)
    ss_np_b = np.asarray(ss_b)
    for ii, s in enumerate(starts):
        idxs = list(range(s, min(s + step, n)))
        if vs_np_b[ii].sum() < 4:
            for i in idxs:
                refined[i] = poses[s]
            continue
        vis = scores_np[ii] > 0.5
        # Host numpy straight into the host-CPU EPnP context — wrapping in
        # jnp.asarray here would cost a device upload + blocking fetch per
        # argument per interval (the transfer bug the pipelined path fixed).
        pv = refiner.compute_pnp_batch(
            tracks_np[ii], ss_np_b[ii], vis & vs_np_b[ii][None], k,
        )
        for li, fi in enumerate(idxs):
            refined[fi] = np.asarray(pv[li])


def smooth_track(
    refiner, mesh, frames, k, poses, interval: int = 12,
    pipelined: bool = True, cap: int = 512, keep_coarse_translation: bool = True,
    inliers=None, device_mesh=None, mesh_axis: str = "data",
    batched_intervals: bool | None = None, cap_buckets=None, telemetry=None,
):
    """Full track-refine pass over one video (reference
    smooth_poses_video.py:92-192): confidence scoring picks the best start
    frame, 12-frame intervals track 2D-3D correspondences and solve EPnP,
    rotations/translations smooth over the track. Returns (smoothed [N, 4, 4],
    inliers [N]).

    pipelined=True (default) runs STATIC-SHAPE intervals: the top-`cap`
    valid correspondences (grid order) with masked EPnP instead of the
    dynamic boolean subset. Every interval then reuses TWO compiled programs
    (correspondences + one fixed-length ZNCC chain) and the device work of
    interval i+1 enqueues while interval i's track fetch is in flight —
    the dynamic path compiles a fresh chain per distinct valid-count and
    serializes on each interval's fetch. Numerics match the dynamic path
    whenever a frame has <= cap valid correspondences (masked EPnP ==
    subset EPnP; ZNCC tracks are per-point independent — parity-tested).

    `frames` may be a host [T, H, W, 3] uint8 array or a StagedVideo (the
    whole video already in HBM at a bucketed length): the staged path slices
    confidence chunks and gathers interval frames ON DEVICE — zero per-chunk
    host uploads, and every program keys on the bucket, not the video length
    (requires pipelined=True).

    `device_mesh` (staged + pipelined only) shards the whole pass over the
    mesh's `mesh_axis`: confidence chunks fan frames out per chip, and the
    intervals run as ONE batched program — batched correspondences render +
    batched ZNCC chains — with the interval axis sharded (each chip scans
    its own intervals). Results equal the single-device pipelined path
    (parity-tested on the 8-device CPU mesh).

    `cap_buckets` (pipelined only; e.g. (128, 256, 512)) makes the
    correspondence cap ADAPTIVE per interval: phase 1 enqueues every
    interval's correspondence render and async-fetches only the valid
    COUNTS; phase 2 sizes each interval's chain to the smallest bucket
    covering its count (the largest bucket acts as the static `cap`).
    Sparse intervals (distant/small objects) then pay bucket-128 ZNCC+EPnP
    work instead of the full cap — results are EXACTLY the static-cap
    path's (selection keeps valid-first grid order; padded rows are masked
    from EPnP; ZNCC is per-point independent — parity-tested both
    directions). `telemetry` (a dict) records the per-interval choices
    under "cap_choices"."""
    from freepose_tpu.datasets.video import StagedVideo

    staged = isinstance(frames, StagedVideo)
    if staged and not pipelined:
        raise ValueError("StagedVideo requires pipelined=True")
    n = frames.n if staged else len(frames)
    if inliers is not None:
        # Confidence scoring already ran (e.g. a StreamingInliers pass
        # overlapped with the refine loop) — skip straight to the intervals.
        inliers = np.asarray(inliers)
        if len(inliers) != n:
            raise ValueError(f"inliers length {len(inliers)} != {n} frames")
    elif staged:
        inliers, _ = refiner.n_inliers_per_pose(
            mesh, frames.frames, k, poses, n_valid=n, channels_last=True,
            device_mesh=device_mesh, mesh_axis=mesh_axis)
    else:
        inliers, _ = refiner.n_inliers_per_pose(mesh, frames.transpose(0, 3, 1, 2), k, poses)
    if device_mesh is not None and not staged:
        raise ValueError("device_mesh requires an HBM StagedVideo")
    if staged:
        frames_dev = frames.frames  # [B, H, W, 3] uint8 device
    best = int(np.argmax(inliers))
    step = interval
    refined: dict[int, np.ndarray] = {}
    starts = sorted(set(list(range(best, n, step)) + list(range(best, -1, -step))))
    starts = [s for s in starts if s < n]
    if batched_intervals is None:
        batched_intervals = device_mesh is not None
    if batched_intervals and not staged:
        raise ValueError("batched_intervals requires an HBM StagedVideo")
    if batched_intervals and getattr(refiner.tracker, "track_device_batch", None) is None:
        raise ValueError("batched_intervals requires a batch-capable tracker (ZNCC)")
    if batched_intervals:
        _batched_intervals(
            refiner, mesh, frames_dev, k, poses, starts, step, n, cap,
            refined, device_mesh, mesh_axis)
    elif not pipelined:
        for s in starts:
            idxs = list(range(s, min(s + step, n)))
            if idxs:
                anchor = refined.get(s, poses[s])
                refined.update(predict_interval(refiner, mesh, frames, k, anchor, s, idxs))
    else:
        track_dev = getattr(refiner.tracker, "track_device", None)
        caps = None
        if cap_buckets is not None:
            caps = tuple(sorted(set(int(b) for b in cap_buckets)))
        # Phase 1: enqueue every interval's correspondence render
        # back-to-back; with adaptive caps, async-fetch only each
        # interval's scalar valid COUNT (the bucket choice needs it on
        # host; the fetches overlap the remaining renders).
        pre = []
        for s in starts:
            idxs = list(range(s, min(s + step, n)))
            if not idxs:
                continue
            # compute_2d3d_correspondences never reads photo pixels (see its
            # docstring) — the staged path passes a dummy instead of slicing
            # the device buffer (a per-start-index slice would compile one
            # program per distinct start), and keeps results on DEVICE so
            # every interval's correspondences + track chain enqueue
            # back-to-back (fetches drain in the second loop).
            photo = jnp.zeros((3, 2, 2)) if staged else frames[s].transpose(2, 0, 1)
            query, surface, valid = refiner.compute_2d3d_correspondences(
                mesh, photo, k, jnp.asarray(poses[s]), fetch=not staged
            )
            nv = None
            if caps is not None:
                nv = jnp.sum(valid.astype(jnp.int32))
                try:
                    nv.copy_to_host_async()
                except Exception:
                    pass
            pre.append((s, idxs, query, surface, valid, nv))
        jobs = []
        for s, idxs, query, surface, valid, nv in pre:
            if nv is None:
                icap = cap
            else:
                n_valid = int(np.asarray(nv))
                icap = next((b for b in caps if b >= n_valid), caps[-1])
                if telemetry is not None:
                    telemetry.setdefault("cap_choices", []).append((s, icap))
            # Static top-`icap` selection: valid correspondences first, grid
            # order (the dynamic path's subset order), padding after.
            g2 = valid.shape[0]
            order = jnp.argsort(
                jnp.where(valid, 0, g2 + 1) + jnp.arange(g2)
            )[: min(icap, g2)]
            qs, ss, vs = query[order], surface[order], valid[order]
            # Pad the interval to `step` frames (clamped repeats) so every
            # interval's chain shares ONE compiled shape; padded rows drop.
            pad_idxs = [min(max(i, 0), n - 1) for i in idxs] + [idxs[-1]] * (step - len(idxs))
            if staged:
                # ONE device gather (program keyed on the bucket shape, index
                # VALUES are data) — zero host bytes per interval.
                sub = jnp.take(frames_dev, jnp.asarray(np.asarray(pad_idxs, np.int32)), axis=0)
            else:
                sub = frames[pad_idxs]
            if track_dev is not None:
                tracks, scores = track_dev(sub, qs, 0)
                vis = None
                # Prefetch EVERYTHING the PnP epilogue reads (incl. the
                # surface points): a device array reaching the host-CPU EPnP
                # context costs a blocking tunnel transfer per argument.
                for a in (tracks, scores, vs, ss, qs):
                    try:
                        a.copy_to_host_async()
                    except Exception:
                        pass
            elif getattr(refiner.tracker, "accepts_device_video", False):
                # Device-capable host tracker (CoTracker2Predictor): hand it
                # the staged gather directly — it resizes/casts on device and
                # fetches only the [T, N, 2] track results.
                tracks, vis = refiner.track_frames(sub, np.asarray(qs), 0)
                scores = None
            else:
                tracks, vis = refiner.track_frames(np.asarray(sub), np.asarray(qs), 0)
                scores = None
            jobs.append((s, idxs, ss, vs, tracks, vis, scores))
        for s, idxs, ss, vs, tracks, vis, scores in jobs:
            vs_np = np.asarray(vs)
            if vs_np.sum() < 4:
                for i in idxs:
                    refined[i] = poses[s]
                continue
            if vis is None:
                vis = np.asarray(scores) > 0.5
            pv = refiner.compute_pnp_batch(
                np.asarray(tracks), np.asarray(ss),
                np.asarray(vis) & vs_np[None], k
            )
            for li, fi in enumerate(idxs):
                refined[fi] = np.asarray(pv[li])
    out_poses = np.stack([refined.get(i, poses[i]) for i in range(n)])
    if keep_coarse_translation:
        out_poses[:, :3, 3] = poses[:, :3, 3]  # reference :356
    # Staged videos pin the smoothing bucket to the HBM buffer length so a
    # short warm-up prefix compiles the exact program the full pass runs.
    bucket = int(frames.frames.shape[0]) if staged else None
    smoothed = np.asarray(
        smooth_transforms(jnp.asarray(out_poses, jnp.float32), bucket=bucket))
    return smoothed, np.asarray(inliers)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video-dir", required=True)
    ap.add_argument("--poses", required=True, help="coarse CSV from dino_inference_video")
    ap.add_argument("--mesh-dir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--weights", default=None, help="DINOv2-B params (.npz)")
    ap.add_argument("--tracker", default=None, choices=["zncc", "cotracker2"],
                    help="point tracker. Default: cotracker2 (the reference's "
                         "tracker, tracking_refiner.py:24) WHEN --tracker-weights "
                         "is supplied, else the weight-free ZNCC chaining")
    ap.add_argument("--tracker-weights", default=None,
                    help="converted CoTracker2 params (.npz) from "
                         "scripts/convert_weights.py --kind cotracker2-hub")
    ap.add_argument("--tracker-config", default=None,
                    help="JSON file of CoTracker2Config field overrides "
                         "(small rigs / CI; default: the released COTRACKER2)")
    ap.add_argument("--interval", type=int, default=12)
    ap.add_argument("--keep-coarse-translation", action="store_true", default=True)
    ap.add_argument("--exact-intervals", action="store_true",
                    help="dynamic per-interval correspondence subsets (one "
                    "compiled chain per distinct valid-count, serialized "
                    "fetches) instead of the default static-shape pipelined "
                    "intervals — see smooth_track")
    ap.add_argument("--cap", type=int, default=512,
                    help="pipelined mode: max tracked correspondences per "
                    "interval (grid-order valid-first)")
    ap.add_argument("--cap-buckets", type=int, nargs="+", default=[128, 256, 512],
                    help="adaptive per-interval cap buckets (sparse intervals "
                    "run smaller track/PnP programs at exact parity); pass a "
                    "single value equal to --cap to disable")
    args = ap.parse_args()

    frames = load_frames(args.video_dir)
    h, w = frames.shape[1:3]
    k = default_video_intrinsics(w, h)
    coarse = read_results_csv(args.poses, t_scale=1.0)
    coarse.sort(key=lambda r: r.im_id)
    mesh_id = coarse[0].obj_id
    scale = coarse[0].scale
    mesh = load_obj(Path(args.mesh_dir) / mesh_id / f"{mesh_id}.obj").normalized().scaled(scale)

    extractor = load_dino_extractor(args.weights, model="vitb")
    feature_fn = lambda imgs: extractor(imgs, layer=None, feature_type="patch")
    if args.tracker is None:
        # CoTracker2 is the reference's production tracker; it becomes the
        # default as soon as converted weights are provided. Without weights
        # the weight-free ZNCC path keeps the CLI usable offline.
        args.tracker = "cotracker2" if args.tracker_weights else "zncc"
    if args.tracker == "cotracker2":
        from freepose_tpu.models.cotracker2 import COTRACKER2, CoTracker2Predictor
        from scripts.common import load_params

        tcfg = COTRACKER2
        if args.tracker_config:
            import dataclasses as _dc
            import json as _json

            over = _json.loads(Path(args.tracker_config).read_text())
            if "model_resolution" in over:
                over["model_resolution"] = tuple(over["model_resolution"])
            tcfg = _dc.replace(tcfg, **over)
        params = (load_params(args.tracker_weights) if args.tracker_weights
                  else CoTracker2Predictor.init_params(tcfg))
        tracker = CoTracker2Predictor(params, tcfg)
    else:
        tracker = PointTracker(mode="correlation")
    refiner = TrackingRefiner(
        feature_fn=feature_fn, tracker=tracker,
        extractor=extractor, feature_layer=None,  # fused one-dispatch confidence
    )

    poses = np.stack([np.vstack([np.hstack([r.R, r.t[:, None]]), [0, 0, 0, 1]]) for r in coarse])
    n = len(frames)
    if not args.exact_intervals and jax.devices()[0].platform != "cpu":
        # Stage the whole video in HBM once: the pass then slices/gathers on
        # device (zero per-chunk uploads) and its programs key on the frame
        # bucket, not this video's length.
        from freepose_tpu.datasets.video import stage_frames_hbm

        frames = stage_frames_hbm(frames)
    t0 = time.perf_counter()
    smoothed, inliers = smooth_track(
        refiner, mesh, frames, k, poses, interval=args.interval,
        pipelined=not args.exact_intervals, cap=args.cap,
        keep_coarse_translation=args.keep_coarse_translation,
        cap_buckets=tuple(args.cap_buckets) if args.cap_buckets else None,
    )
    print(f"inliers per frame: {inliers.tolist()} -> start at {int(np.argmax(inliers))}")
    dt = time.perf_counter() - t0

    results = [
        PoseResult(
            scene_id=0, im_id=r.im_id, obj_id=mesh_id, score=r.score,
            R=smoothed[i, :3, :3], t=smoothed[i, :3, 3], bbox_visib=r.bbox_visib,
            scale=scale, time=dt / n,
        )
        for i, r in enumerate(coarse)
    ]
    out = args.out or str(Path(args.poses).with_suffix("")) + "-tracked.csv"
    write_results_csv(results, out, t_scale=1.0)
    print(f"refined track -> {out}")


if __name__ == "__main__":
    main()
