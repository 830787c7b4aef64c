"""Per-frame 6D pose tracking on a video with the online estimator.

CLI counterpart of reference scripts/dino_inference_video.py: frame 0 runs
the coarse 600-view estimator; later frames refine within the geodesic
neighbourhood of the previous pose (re-render + rescore). Synthetic K from
the image diagonal (reference :116-118); CSV translations in metres; real
per-frame times in the `time` column.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from freepose_tpu.datasets.template import WebTemplateDataset
from freepose_tpu.geometry.camera import default_video_intrinsics
from freepose_tpu.io.bop_csv import PoseResult, write_results_csv
from freepose_tpu.io.mesh import load_obj
from freepose_tpu.io.proposals_json import load_proposals, proposal_bbox_xyxy, proposal_mask
from freepose_tpu.pipeline.online_pose_estimator import OnlinePoseEstimator
from freepose_tpu.pipeline.proposals import extract_proposals
from freepose_tpu.pipeline.renderer import TemplateRenderer
from freepose_tpu.pipeline.template_bank import TemplateBank
from freepose_tpu.geometry.rotation import template_poses
from scripts.common import load_dino_extractor, load_filelist


def load_frames(video_dir: str) -> np.ndarray:
    from freepose_tpu.datasets.video import load_frame_dir

    return load_frame_dir(video_dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video-dir", required=True, help="directory of frames")
    ap.add_argument("--proposals", required=True, help="per-frame proposal JSON (with scale)")
    ap.add_argument("--wds-dir", required=True)
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--mesh-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--layer", type=int, default=22)
    ap.add_argument("--n-coarse", type=int, default=600)
    ap.add_argument("--n-fine", type=int, default=20000)  # reference dino_inference_video.py:64
    ap.add_argument("--neighborhood", type=float, default=15.0)
    ap.add_argument("--n-neighbors", type=int, default=32, help="static cap on the 15-deg ball (measured max: 13 on a 10k grid, 22 on 20k; 16 is a valid fast mode ONLY with --n-fine 10000)")
    ap.add_argument("--no-rescore", action="store_true", help="coarse-only per frame")
    ap.add_argument("--mask-scores", action="store_true")
    ap.add_argument(
        "--fine-cache", type=int, default=256, metavar="SLOTS",
        help="fine-view cache capacity (0 disables): per-view render features/"
        "masks/stats are exact functions of the fine-grid index, so warm "
        "frames featurize only the query crop + newly-entered views",
    )
    ap.add_argument(
        "--zoom-renders", action="store_true",
        help="render fine views under per-pose zoomed intrinsics (native-res "
        "object detail, no crop-upsample). Changes rescore numerics vs the "
        "reference flow; opt-in — see STATUS.md for the synthetic A/B",
    )
    ap.add_argument(
        "--fuse-objects", action="store_true",
        help="fuse all of a frame's cache-hit (resp. cache-miss) objects "
        "into one dispatch. Parity-tested but measured SLOWER than serial "
        "per-object dispatch on a v5e (batch-1 ViT-L@420 already saturates "
        "the chip) — see STATUS.md",
    )
    ap.add_argument(
        "--shard-refine", action="store_true",
        help="fan refine work over all devices (multi-chip latency scaling). "
        "Composes with the fine-view cache: cache buffers replicate over the "
        "mesh and each miss batch's cold render+feature work shards; with "
        "--fine-cache 0, the full neighborhood shards every frame",
    )
    ap.add_argument(
        "--chain-refine", type=int, default=1, metavar="0|1",
        help="pipelined autonomous refine chain (fine_cache.DeviceCache): "
        "per-object steps enqueue back-to-back with the cache's slot table, "
        "LRU and eviction on device — no host round trip per frame. Results "
        "equal the serial path (parity-tested); requires --fine-cache, "
        "disabled under --shard-refine / --fuse-objects. 12.19 vs 8.05 "
        "FPS/chip measured on one v5e (STATUS.md)",
    )
    ap.add_argument(
        "--adaptive-bucket", action="store_true",
        help="chain refine: escalate/de-escalate the stream miss bucket with "
        "the observed per-frame miss rate (fast motion grows the bucket "
        "before overflow forces full re-dispatches; settled motion shrinks "
        "it). Results are exact either way — the bucket only bounds "
        "self-served misses + prefetch padding",
    )
    args = ap.parse_args()

    frames = load_frames(args.video_dir)
    h, w = frames.shape[1:3]
    k = default_video_intrinsics(w, h)
    props = load_proposals(args.proposals)
    templates = WebTemplateDataset(args.wds_dir, load_filelist(args.filelist))
    extractor = load_dino_extractor(args.weights)
    feature_fn = lambda imgs: extractor(imgs, layer=args.layer, feature_type="patch")
    renderer = TemplateRenderer(n_poses=args.n_coarse)
    bank = TemplateBank(feature_fn, renderer, cache_size=4)
    shard_mesh = None
    if args.shard_refine:
        import jax

        from freepose_tpu.parallel.mesh import make_mesh

        shard_mesh = make_mesh(data=1, model=len(jax.devices()))
    estimator = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=args.n_coarse,
        n_fine_poses=args.n_fine, n_neighbors=args.n_neighbors,
        extractor=extractor, feature_layer=args.layer,  # fused refine-prepare
        fine_cache_capacity=max(args.fine_cache, args.n_neighbors) if args.fine_cache else 0,
        shard_mesh=shard_mesh,
        zoom_renders=args.zoom_renders,
    )

    by_frame: dict[int, list] = {}
    for p in props:
        by_frame.setdefault(p["image_id"], []).append(p)

    # Per-object state: previous pose (single-object tracks after
    # filter_predictions, like the reference's video flow).
    prev_pose: dict[str, jnp.ndarray] = {}
    mesh_cache: dict[str, object] = {}
    results: list[PoseResult] = []
    frame_dev: dict[int, jnp.ndarray] = {}  # 1-frame upload prefetch
    use_chain = bool(
        args.chain_refine and args.fine_cache and shard_mesh is None
        and not args.fuse_objects and not args.no_rescore
    )
    chains: dict[str, object] = {}  # mesh_id -> AutoRefineChain
    chain_meta: dict[str, list] = {}
    all_scores: dict[str, list] = {}  # --no-rescore: mesh_id -> [V] per frame
    import jax

    def _frame_masks(f):
        """Next frame's proposal masks/bboxes as device uploads (masks decode
        from RLE on host, then one async device_put — prefetched a frame
        ahead so the ~1 MB/frame mask upload overlaps compute instead of
        stalling the refine dispatch, the re-upload VERDICT flagged at
        dino_inference_video.py:150-155)."""
        plist = by_frame.get(f, [])
        if not plist:
            return None
        masks_np = np.stack([proposal_mask(p) for p in plist])
        bboxes_np = np.stack(
            [proposal_bbox_xyxy(p).astype(np.float32) for p in plist]
        )
        return jax.device_put(masks_np), np.asarray(bboxes_np)

    mask_dev: dict[int, object] = {}
    for f in range(len(frames)):
        frame_f = frame_dev.pop(f, None)
        if frame_f is None:
            frame_f = jnp.asarray(frames[f])
        masks_f = mask_dev.pop(f, None)
        if masks_f is None:
            masks_f = _frame_masks(f)
        if f + 1 < len(frames):
            # Start next frame's host->device copies so they overlap this
            # frame's compute (device_put is asynchronous).
            frame_dev.clear()
            frame_dev[f + 1] = jax.device_put(frames[f + 1])
            mask_dev.clear()
            mask_dev[f + 1] = _frame_masks(f + 1)
        frame_objs: list[dict] = []  # rescore objects, batched per frame
        frame_meta: list[tuple] = []
        t_frame = time.perf_counter()
        plist = by_frame.get(f, [])
        if plist:
            # One crop batch for all of the frame's objects (they share the
            # image; extract_proposals is batched over proposals).
            masks_up, bboxes_np = masks_f
            frame_props = extract_proposals(
                frame_f, masks_up, jnp.asarray(bboxes_np),
                target_size=420, bbox_extend=0.2,
            )
        for i, p in enumerate(plist):
            t0 = time.perf_counter()
            mesh_id = p["mesh"]
            if mesh_id not in mesh_cache:
                mesh_cache[mesh_id] = load_obj(Path(args.mesh_dir) / mesh_id / f"{mesh_id}.obj").normalized()
            mesh = mesh_cache[mesh_id]
            bbox = bboxes_np[i]
            item = templates.get_template_by_name(mesh_id)
            pack = bank.cache.get(item["model_name"])
            if pack is None:
                from freepose_tpu.geometry.boxes import mask_to_bbox
                from freepose_tpu.geometry.crop import crop_resize_pad
                import jax

                rgb = jnp.asarray(item["rgb"]).transpose(0, 3, 1, 2)
                tb = jax.vmap(mask_to_bbox)(jnp.asarray(item["masks"]))
                pack = bank.pack_from_views(
                    item["model_name"], crop_resize_pad(rgb, tb, 420),
                    jnp.asarray(item["depth"]), template_poses(rgb.shape[0]),
                    jnp.asarray(item["intrinsic"]),
                )
                bank.cache[item["model_name"]] = pack
            scale = float(p.get("scale", 0.1))
            if args.no_rescore or mesh_id not in prev_pose:
                out = estimator.coarse.estimate(
                    frame_props.proposals[i], pack, k, bbox, scale,
                    return_query_feat=False, return_all_scores=args.no_rescore,
                )
                tco = np.asarray(out.tcos[0])
                if args.no_rescore:
                    # Reference dino_inference_video.py:158-159,177-180 keeps
                    # every view's coarse score for offline analysis.
                    all_scores.setdefault(mesh_id, []).append(
                        np.asarray(out.all_scores)
                    )
                else:
                    prev_pose[mesh_id] = out.tcos[0]
                results.append(PoseResult(
                    scene_id=0, im_id=f, obj_id=mesh_id, score=float(out.scores[0]),
                    R=tco[:3, :3], t=tco[:3, 3],
                    bbox_visib=np.array([bbox[0], bbox[1], bbox[2] - bbox[0], bbox[3] - bbox[1]]),
                    scale=scale, time=time.perf_counter() - t0,
                ))
            elif use_chain:
                ch = chains.get(mesh_id)
                if ch is None:
                    from freepose_tpu.pipeline.online_pose_estimator import AutoRefineChain

                    ch = chains[mesh_id] = AutoRefineChain(
                        estimator, mesh, mesh_id,
                        neighborhood_deg=args.neighborhood,
                        mask_scores=args.mask_scores,
                        adaptive_bucket=args.adaptive_bucket,
                    )
                    chain_meta[mesh_id] = []
                    seed = prev_pose[mesh_id]
                else:
                    seed = None
                ch.submit(
                    frame_props.proposals[i], frame_props.masks[i], k,
                    jnp.asarray(bbox), scale, prev_pose=seed,
                )
                chain_meta[mesh_id].append(
                    (f, bbox, scale, time.perf_counter() - t0)
                )
            else:
                frame_objs.append(dict(
                    proposal=frame_props.proposals[i], proposal_mask=frame_props.masks[i],
                    pack=pack, mesh=mesh, k=k, bbox=bbox, est_scale=scale,
                    prev_pose=prev_pose.get(mesh_id), cache_key=mesh_id,
                ))
                frame_meta.append((mesh_id, bbox, scale))
        if frame_objs:
            # All cache-hit objects of the frame share ONE fused dispatch
            # (estimate_frame); without the fine cache, refine serially.
            if args.fine_cache:
                outs = estimator.estimate_frame(
                    frame_objs, neighborhood_deg=args.neighborhood,
                    mask_scores=args.mask_scores, fuse=args.fuse_objects,
                )
            else:
                outs = [
                    estimator.estimate(
                        o["proposal"], o["proposal_mask"], o["pack"], o["mesh"],
                        o["k"], o["bbox"], o["est_scale"], prev_pose=o["prev_pose"],
                        neighborhood_deg=args.neighborhood,
                        mask_scores=args.mask_scores,
                    )
                    for o in frame_objs
                ]
            dt = (time.perf_counter() - t_frame) / len(frame_objs)
            for out, (mesh_id, bbox, scale) in zip(outs, frame_meta):
                tco = np.asarray(out.tcos[0])
                prev_pose[mesh_id] = out.tcos[0]
                results.append(PoseResult(
                    scene_id=0, im_id=f, obj_id=mesh_id, score=float(out.scores[0]),
                    R=tco[:3, :3], t=tco[:3, 3],
                    bbox_visib=np.array([bbox[0], bbox[1], bbox[2] - bbox[0], bbox[3] - bbox[1]]),
                    scale=scale, time=dt,
                ))
        print(f"frame {f}: {len(by_frame.get(f, []))} objects")

    # Flush the refine chains (results arrive with a small pipeline lag).
    for mesh_id, ch in chains.items():
        for (tc, sc), (f, bbox, scale, dt) in zip(
            ch.finalize_all(), chain_meta[mesh_id]
        ):
            results.append(PoseResult(
                scene_id=0, im_id=f, obj_id=mesh_id, score=sc,
                R=tc[:3, :3], t=tc[:3, 3],
                bbox_visib=np.array([bbox[0], bbox[1], bbox[2] - bbox[0], bbox[3] - bbox[1]]),
                scale=scale, time=dt,
            ))

    results.sort(key=lambda r: (r.im_id, str(r.obj_id)))
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    write_results_csv(results, args.out, t_scale=1.0)  # video: metres
    if args.no_rescore and all_scores:
        # Reference :177-180 — stacked per-object per-frame view scores plus
        # the coarse pose grid, for offline score-landscape analysis.
        out_dir = Path(args.out).parent
        np.save(out_dir / "all_scores.npy",
                np.stack([np.stack(v) for v in all_scores.values()]))
        np.save(out_dir / "all_poses.npy", np.asarray(estimator.coarse.mesh_poses))
        print(f"all_scores.npy + all_poses.npy -> {out_dir}")
    print(f"{len(results)} poses -> {args.out}")


if __name__ == "__main__":
    main()
