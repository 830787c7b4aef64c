"""Benchmark the per-frame fine-refine step (video pose tracking hot path).

Simulates a tracked object rotating at a constant angular velocity and
measures steady-state ms/frame of OnlinePoseEstimator.refine for both the
fine-view-cache path (pipeline/fine_cache.py) and the uncached fused path.
The trajectory's speed (--deg-per-frame) controls the cache miss rate: a
real handheld-video object moves ~1-3°/frame, so most of the 15° geodesic
neighbourhood persists between frames.

Production config by default: ViT-L/14-reg bf16 @420², 20k fine grid, 32
neighbours, 16k-face mesh. Random weights (timing only).

  python -m scripts.bench_refine            # TPU (or whatever the platform is)
  python -m scripts.bench_refine --tiny     # smoke-test shapes on CPU
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def run_refine_bench(args) -> dict:
    """Run the bench; returns {'cached_ms_median', 'cached_ms_mean',
    'uncached_ms_mean' (if measured), 'misses_per_frame'}."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from freepose_tpu.geometry.rotation import template_poses
    from freepose_tpu.io.mesh import TriMesh
    from freepose_tpu.models.dinov2 import VIT_L14_REG, DinoFeatureExtractor, DinoV2Config
    from freepose_tpu.ops.rasterizer import RasterSettings
    from freepose_tpu.pipeline.online_pose_estimator import OnlinePoseEstimator
    from freepose_tpu.pipeline.renderer import TemplateRenderer
    from freepose_tpu.pipeline.template_bank import TemplateBank

    if args.tiny:
        cfg = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56)
        res, layer, n_fine = 84, 2, 500
        renderer = TemplateRenderer(
            n_poses=16, resolution=res, max_vertices=256, max_faces=512,
            settings=RasterSettings(resolution=res, tile=28, max_faces_per_tile=128),
        )
    else:
        cfg = dataclasses.replace(VIT_L14_REG, dtype=jnp.bfloat16, use_flash=True)
        res, layer, n_fine = 420, args.layer, args.n_fine
        renderer = TemplateRenderer(n_poses=600, resolution=res)

    # Synthetic bumpy-sphere mesh near the face cap.
    rng = np.random.default_rng(0)
    n_lat = 16 if args.tiny else 90
    n_lon = 14 if args.tiny else 90
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
    mesh = TriMesh(v, np.asarray(faces, np.int32), rng.random((len(v), 3)).astype(np.float32))
    print(f"mesh: {len(v)} verts, {len(faces)} faces; platform: {jax.devices()[0].platform}")

    fe = DinoFeatureExtractor(cfg)
    feature_fn = lambda imgs: fe(imgs, layer=layer, feature_type="patch")
    bank = TemplateBank(feature_fn, renderer, cache_size=2)

    def axis_angle(axis, deg):
        axis = np.asarray(axis, np.float64)
        axis = axis / np.linalg.norm(axis)
        a = np.radians(deg)
        kx, ky, kz = axis
        km = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
        return np.eye(3) + np.sin(a) * km + (1 - np.cos(a)) * km @ km

    fine = np.asarray(template_poses(n_fine))
    # Trajectory: start on the grid, rotate steadily around a slowly
    # precessing axis.
    traj = [fine[123].copy()]
    axis = np.array([0.3, 1.0, 0.2])
    for t in range(args.frames + args.warmup):
        p = traj[-1].copy()
        axis = axis + 0.05 * rng.standard_normal(3)
        p[:3, :3] = axis_angle(axis, args.deg_per_frame) @ p[:3, :3]
        traj.append(p)

    # Query proposal: render of the current pose (content irrelevant to
    # timing; realistic shapes/masks).
    rgb, depth = renderer.render_from_poses(mesh, jnp.asarray(traj[0])[None])
    props, masks, boxes = renderer.generate_proposals(rgb, depth)
    proposal = props[0]
    pmask = masks[0]
    bbox = boxes[0].astype(jnp.float32)
    k = renderer.k

    def run(est, label, use_cache):
        times = []
        misses = []
        if use_cache:
            # Compile every miss-bucket variant + the hit path up front so
            # remote compiles never land inside the timed window.
            prev0 = jnp.asarray(traj[0])
            est.refine_cached(proposal, pmask, mesh, k, bbox, 0.15, prev0,
                              mask_scores=args.mask_scores, cache_key="bench")
            cache = est._fine_caches["bench"]
            for m in (1, 5, 9):
                cache.drop(list(cache.slot_of)[:m])
                est.refine_cached(proposal, pmask, mesh, k, bbox, 0.15, prev0,
                                  mask_scores=args.mask_scores, cache_key="bench")
            out = est.refine_cached(proposal, pmask, mesh, k, bbox, 0.15, prev0,
                                    mask_scores=args.mask_scores, cache_key="bench")
            jax.block_until_ready(out.tcos)
        for t, prev in enumerate(traj[: args.warmup + args.frames]):
            prev_j = jnp.asarray(prev)
            if use_cache:
                cache = est._fine_caches.get("bench")
                before = len(cache.slot_of) if cache else 0
            t0 = time.perf_counter()
            if use_cache:
                out = est.refine_cached(
                    proposal, pmask, mesh, k, bbox, 0.15, prev_j,
                    mask_scores=args.mask_scores, cache_key="bench",
                )
            else:
                qf = est.coarse.query_features(proposal)
                out = est.refine(
                    qf, pmask, mesh, k, bbox, 0.15, prev_j,
                    mask_scores=args.mask_scores,
                )
            jax.block_until_ready(out.tcos)
            dt = time.perf_counter() - t0
            if t >= args.warmup:
                times.append(dt)
                if use_cache:
                    misses.append(len(est._fine_caches["bench"].slot_of) - before)
        ms = 1e3 * float(np.mean(times))
        med = 1e3 * float(np.median(times))
        print(
            f"{label}: {ms:.1f} ms/frame = {1e3 / ms:.2f} FPS/chip "
            f"(median {med:.1f} ms"
            + (f", mean misses/frame {np.mean(misses):.1f}" if misses else "")
            + ")"
        )
        return ms, med, (float(np.mean(misses)) if misses else 0.0)

    def run_multi(mk_est, m):
        """Multi-object frames: estimate_frame (fused hit dispatch) vs a
        serial per-object refine_cached loop, all m objects co-tracked.
        Each pass gets its OWN estimator warmed identically at traj[0] so
        both see the same hit/miss pattern along the walk."""
        keys = [f"bench{i}" for i in range(m)]
        objs = [
            dict(proposal=proposal, proposal_mask=pmask, pack=None, mesh=mesh,
                 k=k, bbox=bbox, est_scale=0.15, cache_key=key)
            for key in keys
        ]
        prev0 = jnp.asarray(traj[0])

        def warm(est):
            # Warm compiles: miss buckets (shape-keyed jit caches are
            # process-wide, so they amortize across both passes), the hit
            # path, and the m-object fused hit program. Bucket warmup uses a
            # SCRATCH key so the tracked keys' caches stay in identical
            # states (mixed hit/miss frames would compile new fused variants
            # inside the timed window).
            for key in keys + ["warmup"]:
                est.refine_cached(proposal, pmask, mesh, k, bbox, 0.15, prev0,
                                  mask_scores=args.mask_scores, cache_key=key)
            cache = est._fine_caches["warmup"]
            for n in (1, 5, 9):
                cache.drop(list(cache.slot_of)[:n])
                est.refine_cached(proposal, pmask, mesh, k, bbox, 0.15, prev0,
                                  mask_scores=args.mask_scores, cache_key="warmup")
            del est._fine_caches["warmup"]

            def frame():
                outs = est.estimate_frame(
                    [dict(o, prev_pose=prev0) for o in objs],
                    mask_scores=args.mask_scores, fuse=True,
                )
                for o in outs:
                    jax.block_until_ready(o.tcos)

            frame()  # fused hit program
            for n in (1, 5, 9):
                # Joint drops -> the fused multi-miss update program, one
                # compile per bucket it will see during the walk.
                for key in keys:
                    c = est._fine_caches[key]
                    c.drop(list(c.slot_of)[:n])
                frame()
            frame()  # restore all-hit
            return est

        def timed(step):
            times = []
            for t, prev in enumerate(traj[: args.warmup + args.frames]):
                prev_j = jnp.asarray(prev)
                t0 = time.perf_counter()
                step(prev_j)
                if t >= args.warmup:
                    times.append(time.perf_counter() - t0)
            return 1e3 * float(np.mean(times)), 1e3 * float(np.median(times))

        est_b = warm(mk_est())

        def batched(prev_j):
            outs = est_b.estimate_frame(
                [dict(o, prev_pose=prev_j) for o in objs],
                mask_scores=args.mask_scores, fuse=True,
            )
            for o in outs:
                jax.block_until_ready(o.tcos)

        # MARGINAL rate: enqueue all frames without per-frame blocking and
        # block once at the end. Per-frame round trips pipeline away, so
        # this approximates the device-bound cost a locally-attached chip
        # would see (cf. the STATUS.md tunnel-calibration methodology).
        # Runs right after each pass's timed walk, on its warm caches
        # (i.e. it measures the all-hit steady state).
        def rate(step_outs):
            last = None
            t0 = time.perf_counter()
            for prev in traj[: args.frames]:
                last = step_outs(jnp.asarray(prev))
            for o in last:
                np.asarray(o.tcos)  # full fetch: honest end-of-queue wait
            return 1e3 * (time.perf_counter() - t0) / args.frames

        ms_b, med_b = timed(batched)
        rate_b = rate(lambda p: est_b.estimate_frame(
            [dict(o, prev_pose=p) for o in objs], mask_scores=args.mask_scores,
            fuse=True,
        ))
        est_b._fine_caches.clear()  # free ~m x 0.5 GB before the serial pass

        est_s = warm(mk_est())

        def serial(prev_j):
            for key in keys:
                out = est_s.refine_cached(
                    proposal, pmask, mesh, k, bbox, 0.15, prev_j,
                    mask_scores=args.mask_scores, cache_key=key,
                )
                jax.block_until_ready(out.tcos)

        ms_s, med_s = timed(serial)
        rate_s = rate(lambda p: [
            est_s.refine_cached(proposal, pmask, mesh, k, bbox, 0.15, p,
                                mask_scores=args.mask_scores, cache_key=key)
            for key in keys
        ])

        fps = 1e3 / ms_b
        print(
            f"multi x{m}: batched {ms_b:.1f} ms/frame ({fps:.2f} frame-FPS, "
            f"{m * fps:.1f} obj-FPS; median {med_b:.1f}) vs serial "
            f"{ms_s:.1f} ms/frame (median {med_s:.1f}) -> {ms_s / ms_b:.2f}x; "
            f"enqueue-rate batched {rate_b:.1f} vs serial {rate_s:.1f} ms/frame "
            f"-> {rate_s / rate_b:.2f}x"
        )
        return {
            "multi_batched_ms_mean": ms_b, "multi_batched_ms_median": med_b,
            "multi_serial_ms_mean": ms_s, "multi_serial_ms_median": med_s,
            "multi_batched_rate_ms": rate_b, "multi_serial_rate_ms": rate_s,
            "n_objects": m,
        }

    def mk(cap):
        est = OnlinePoseEstimator(
            feature_fn, bank, renderer, n_coarse_poses=renderer.n_poses,
            n_fine_poses=n_fine, n_neighbors=args.n_neighbors,
            extractor=fe, feature_layer=layer, fine_cache_capacity=cap,
            zoom_renders=args.zoom,
        )
        if args.prefetch_quota is not None:
            est.prefetch_quota = args.prefetch_quota
        return est

    if args.n_objects > 1:
        return run_multi(lambda: mk(max(args.cache, args.n_neighbors)), args.n_objects)

    if args.auto_only:
        out = {}
    else:
        ms_c, med_c, mpf = run(mk(max(args.cache, args.n_neighbors)), "cached ", use_cache=True)
        out = {"cached_ms_mean": ms_c, "cached_ms_median": med_c, "misses_per_frame": mpf}
        if not args.no_uncached:
            ms_u, med_u, _ = run(mk(0), "uncached", use_cache=False)
            print(f"speedup: {ms_u / ms_c:.2f}x (median {med_u / med_c:.2f}x)")
            out.update(uncached_ms_mean=ms_u, uncached_ms_median=med_u)

    if not args.no_chain:
        # Pipelined chain, CLOSED LOOP (prev pose = own refine output — the
        # video pipeline's real feedback): device-side selection lets frames
        # enqueue back-to-back, so the per-frame host round trip of the
        # serial walk pipelines away. Query crops pre-render from the true
        # trajectory so the tracker follows it (comparable miss rate).
        from freepose_tpu.pipeline.online_pose_estimator import CachedRefineChain

        n_total = args.warmup + args.frames
        crops = []
        for p in traj[:n_total]:
            rgb, depth = renderer.render_from_poses(mesh, jnp.asarray(p)[None])
            pr, ma, bo = renderer.generate_proposals(rgb, depth)
            crops.append((pr[0], ma[0], bo[0].astype(jnp.float32)))
        jax.block_until_ready(crops[-1][0])
        prev0 = jnp.asarray(traj[0])

        est_ch = mk(max(args.cache, args.n_neighbors))
        if not args.auto_only:
            def chain_run(est, key):
                chain = CachedRefineChain(
                    est, mesh, key, mask_scores=args.mask_scores, lag=args.chain_lag
                )
                t0 = time.perf_counter()
                for t, (pr, ma, bo) in enumerate(crops):
                    chain.submit(pr, ma, k, bo, 0.15, prev_pose=prev0 if t == 0 else None)
                res = chain.finalize_all()
                dt = time.perf_counter() - t0
                return 1e3 * dt / len(crops), chain, res

            chain_run(est_ch, "chain-warm")  # compile classic buckets + chain step
            del est_ch._fine_caches["chain-warm"]
            ms_ch, chain, _res = chain_run(est_ch, "chain")
            print(
                f"chain   : {ms_ch:.1f} ms/frame = {1e3 / ms_ch:.2f} FPS/chip "
                f"(closed loop, lag {args.chain_lag}; {chain.n_spec_hits} spec hits, "
                f"{chain.n_replayed} replays over {len(crops)} frames)"
            )
            out.update(chain_ms_mean=ms_ch, chain_spec_hits=chain.n_spec_hits,
                       chain_replays=chain.n_replayed)

        # Fully-autonomous device-cache chain: slot table + LRU + self-served
        # misses on device, zero host bookkeeping (fine_cache.DeviceCache).
        from freepose_tpu.pipeline.online_pose_estimator import AutoRefineChain

        def auto_run(lag):
            ch = AutoRefineChain(
                est_ch, mesh, "auto", mask_scores=args.mask_scores,
                lag=lag, miss_bucket=args.auto_bucket,
            )
            t0 = time.perf_counter()
            for t, (pr, ma, bo) in enumerate(crops):
                ch.submit(pr, ma, k, bo, 0.15, prev_pose=prev0 if t == 0 else None)
            ch.finalize_all()
            return 1e3 * (time.perf_counter() - t0) / len(crops), ch

        lags = ([int(s) for s in args.auto_lag_sweep.split(",")]
                if args.auto_lag_sweep else [args.chain_lag])
        auto_run(lags[0])  # compile both auto-step variants
        if getattr(args, "profile", None):
            jax.profiler.start_trace(args.profile)
            auto_run(lags[0])
            jax.profiler.stop_trace()
            print(f"profile trace -> {args.profile}")
        for lag in lags:
            ms_au, auto = auto_run(lag)
            mc = np.asarray(auto.miss_counts)
            print(
                f"auto    : {ms_au:.1f} ms/frame = {1e3 / ms_au:.2f} FPS/chip "
                f"(device-side cache, bucket {args.auto_bucket}, lag "
                f"{lag}; {auto.n_full_redispatch} full re-dispatches, "
                f"{int((mc > 0).sum())}/{len(mc)} miss frames, "
                f"mean {mc.mean():.1f} misses/frame)"
            )
            out.update(auto_ms_mean=ms_au, auto_redispatches=auto.n_full_redispatch,
                       auto_miss_frames=int((mc > 0).sum()),
                       auto_misses_per_frame=float(mc.mean()))
    return out


def make_args(**overrides) -> argparse.Namespace:
    ap = _parser()
    args = ap.parse_args([])
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def _parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="smoke-test config (CPU-friendly)")
    ap.add_argument("--n-fine", type=int, default=20000)
    ap.add_argument("--n-neighbors", type=int, default=32)
    ap.add_argument("--layer", type=int, default=22)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--deg-per-frame", type=float, default=2.0)
    ap.add_argument("--cache", type=int, default=256)
    ap.add_argument("--no-uncached", action="store_true", help="skip the uncached baseline")
    ap.add_argument("--no-chain", action="store_true",
                    help="skip the pipelined closed-loop chain measurement")
    ap.add_argument("--chain-lag", type=int, default=3,
                    help="frames the chain's host finalize trails the dispatch")
    ap.add_argument("--profile", default=None,
                    help="jax.profiler trace dir for the auto-chain run")
    ap.add_argument("--auto-only", action="store_true",
                    help="measure only the autonomous device-cache chain")
    ap.add_argument("--auto-lag-sweep", default=None,
                    help="comma list of lags to sweep for the auto chain")
    ap.add_argument("--auto-bucket", type=int, default=16,
                    help="stream miss bucket of the autonomous device-cache chain "
                         "(swept on v5e at 2°/frame: 8→90.4, 16→82.0 ms/frame)")
    ap.add_argument("--mask-scores", action="store_true")
    ap.add_argument("--zoom", action="store_true", help="zoomed-K fine renders (see --zoom-renders)")
    ap.add_argument(
        "--prefetch-quota", type=int, default=None,
        help="override OnlinePoseEstimator.prefetch_quota (extra views "
        "pre-cached per miss frame; default 4)",
    )
    ap.add_argument(
        "--n-objects", type=int, default=1,
        help=">1: benchmark multi-object frames (estimate_frame fused hit "
        "dispatch vs a serial per-object loop)",
    )
    return ap


def main() -> None:
    run_refine_bench(_parser().parse_args())


if __name__ == "__main__":
    main()
