"""BOP-style pose evaluation driver (custom freepose protocol).

CLI counterpart of the reference's modified bop_toolkit driver
(bop_toolkit/scripts/eval_bop19_pose.py): for each estimate, compute the
retrieval-aware errors {cus, chamfer, chamfer_proj} against every GT instance
of its frame (GT meshes from the dataset's models dir, inference meshes from
the retrieval mesh cache), then sweep correctness thresholds and report
per-error average recall + the overall AR. Errors run on device (MXU chamfer
NN + TPU silhouette renderer) in one process — no per-error subprocess fan-out
(reference eval_bop19_pose.py:164-230) needed.
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict
from pathlib import Path

import numpy as np

from freepose_tpu.datasets.bop import BOPDataset
from freepose_tpu.evaluation import pose_error as pe
from freepose_tpu.evaluation.score import DEFAULT_ERROR_THRESHOLDS, EstimateErrors, bop19_average_recalls
from freepose_tpu.io.bop_csv import read_results_csv
from freepose_tpu.io.mesh import load_obj, load_ply
from freepose_tpu.parallel.scheduler import current_shard
from scripts.common import add_shard_args, get_shard


def _load_mesh_any(path_obj: Path, path_ply: Path):
    if path_ply.exists():
        return load_ply(path_ply)
    if path_obj.exists():
        return load_obj(path_obj)
    raise FileNotFoundError(f"{path_obj} / {path_ply}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True, help="BOP result CSV (t in mm)")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--models-dir", required=True, help="GT models (obj_<id>.ply)")
    ap.add_argument("--inference-mesh-dir", required=True, help="retrieved mesh cache")
    ap.add_argument("--errors", nargs="+", default=["cus", "chamfer", "chamfer_proj"],
                    help="any of cus chamfer chamfer_proj vsd mssd mspd")
    ap.add_argument("--n-points", type=int, default=2000, help="surface samples per mesh")
    ap.add_argument("--models-info", default=None,
                    help="models_info.json for mssd/mspd symmetries + diameters")
    ap.add_argument("--vsd-delta", type=float, default=0.015, help="visibility tolerance (m)")
    ap.add_argument("--out", default=None)
    add_shard_args(ap)
    args = ap.parse_args()

    from freepose_tpu.io.bop_csv import check_bop_results

    ok, msg = check_bop_results(args.results)
    if not ok:  # reference driver aborts on malformed CSVs (inout.py:385-421)
        raise SystemExit(f"results format check failed: {msg}")

    dataset = BOPDataset(args.dataset, args.split)
    results = read_results_csv(args.results, t_scale=1000.0)
    by_frame: dict = defaultdict(list)
    for r in results:
        by_frame[(r.scene_id, r.im_id)].append(r)

    # BOP19 VSD sweeps misalignment tolerances; AR_vsd = mean of the per-tau
    # ARs (reference eval_bop19_pose.py:19-40). Each tau becomes its own
    # error column "vsd:<tau>".
    vsd_taus = tuple(np.round(np.arange(0.05, 0.51, 0.05), 2)) if "vsd" in args.errors else ()
    err_cols = [e for e in args.errors if e != "vsd"] + [f"vsd:{t}" for t in vsd_taus]

    models_info = None
    syms_cache: dict = {}
    if args.models_info:
        from freepose_tpu.evaluation.symmetry import get_symmetry_transformations, load_models_info

        models_info = load_models_info(args.models_info)

        def _syms(obj_id):
            if obj_id not in syms_cache:
                info = models_info.get(obj_id, {})
                syms_cache[obj_id] = [
                    {"R": s["R"], "t": s["t"].reshape(3) / 1000.0}  # mm -> m
                    for s in get_symmetry_transformations(info)
                ]
            return syms_cache[obj_id]
    else:
        def _syms(obj_id):
            return None

    gt_meshes: dict = {}
    inf_meshes: dict = {}
    renderer = None
    per_frame = {err: [] for err in err_cols}
    need_renderer = bool({"cus", "vsd"} & set(args.errors))

    shard = get_shard(args)
    for idx in shard.slice(len(dataset)):
        entry = dataset[idx]
        key = (entry["scene_id"], entry["frame_id"])
        ests = by_frame.get(key, [])
        gts = entry["gt"]
        if not gts:
            continue
        k = entry["intrinsic"]
        if renderer is None and need_renderer:
            h, w = entry["image"].shape[:2]
            renderer = pe.MaskRenderer(w, h)
        im_w = entry["image"].shape[1]

        frame_errors = {err: [] for err in err_cols}
        for est in ests:
            if est.obj_id not in inf_meshes:
                mesh = _load_mesh_any(
                    Path(args.inference_mesh_dir) / str(est.obj_id) / f"{est.obj_id}.obj",
                    Path(args.inference_mesh_dir) / f"{est.obj_id}.ply",
                ).normalized().scaled(est.scale)
                inf_meshes[est.obj_id] = mesh
                if renderer is not None:
                    renderer.add_object(est.obj_id, mesh)
            pts_est = inf_meshes[est.obj_id].sample_surface(args.n_points)
            errs = {err: {} for err in err_cols}
            for gi, gt in enumerate(gts):
                obj_id = gt["obj_id"]
                if obj_id not in gt_meshes:
                    mesh = _load_mesh_any(
                        Path(args.models_dir) / f"obj_{obj_id:06d}.obj",
                        Path(args.models_dir) / f"obj_{obj_id:06d}.ply",
                    )
                    gt_meshes[obj_id] = mesh.scaled(0.001)  # BOP models in mm
                    if renderer is not None:
                        renderer.add_object(f"gt{obj_id}", gt_meshes[obj_id])
                pts_gt = gt_meshes[obj_id].sample_surface(args.n_points)
                r_gt = np.asarray(gt["cam_R_m2c"], np.float64).reshape(3, 3)
                t_gt = np.asarray(gt["cam_t_m2c"], np.float64).reshape(3) / 1000.0
                diameter = 2.0 * gt_meshes[obj_id].half_extent()
                for err in args.errors:
                    if err == "chamfer":
                        e = pe.chamfer(est.R, est.t, r_gt, t_gt, pts_est, pts_gt) / max(diameter, 1e-9)
                    elif err == "chamfer_proj":
                        e = pe.chamfer_proj(est.R, est.t, r_gt, t_gt, k, pts_est, pts_gt)
                    elif err == "cus":
                        e = pe.cus(est.R, est.t, r_gt, t_gt, k, renderer, est.obj_id, f"gt{obj_id}")
                    elif err == "mssd":
                        # Normalized by diameter (BOP19 thresholds 0.05-0.5 d).
                        e = pe.mssd(est.R, est.t, r_gt, t_gt, pts_est, pts_gt,
                                    syms=_syms(obj_id)) / max(diameter, 1e-9)
                    elif err == "mspd":
                        # BOP19 thresholds 5r..50r px with r = w/640; store
                        # the error already divided by r.
                        e = pe.mspd(est.R, est.t, r_gt, t_gt, k, pts_est, pts_gt,
                                    syms=_syms(obj_id)) / (im_w / 640.0)
                    elif err == "vsd":
                        depth_test = entry.get("depth")
                        if depth_test is None:
                            raise SystemExit("vsd requires the dataset's test depth images")
                        vs = pe.vsd(est.R, est.t, r_gt, t_gt, depth_test, k,
                                    delta=args.vsd_delta, taus=vsd_taus,
                                    normalized_by_diameter=True, diameter=diameter,
                                    renderer=renderer, inf_id=est.obj_id, gt_id=f"gt{obj_id}")
                        for tau, v in zip(vsd_taus, vs):
                            errs[f"vsd:{tau}"][gi] = float(v)
                        continue
                    else:
                        raise ValueError(err)
                    errs[err][gi] = float(e)
            for err in err_cols:
                frame_errors[err].append(
                    EstimateErrors(entry["scene_id"], entry["frame_id"], est.obj_id, est.score, errs[err])
                )
        for err in err_cols:
            per_frame[err].append((frame_errors[err], len(gts)))

    from freepose_tpu.evaluation.score import DEFAULT_ERROR_THRESHOLDS as _TH

    thresholds = dict(_TH)
    for tau in vsd_taus:
        thresholds[f"vsd:{tau}"] = np.arange(0.05, 0.51, 0.05)  # BOP19 vsd sweep
    scores = bop19_average_recalls({e: per_frame[e] for e in err_cols}, thresholds)
    if vsd_taus:
        # AR_vsd = mean over the tau sweep (reference eval_bop19_pose.py:19-40);
        # fold the per-tau columns into one headline number.
        per_tau = [scores.pop(f"AR_vsd:{tau}") for tau in vsd_taus]
        scores["AR_vsd"] = float(np.mean(per_tau))
        ar_keys = [v for k2, v in scores.items() if k2.startswith("AR_")]
        scores["AR"] = float(np.mean(ar_keys))
    mean_time = float(np.mean([r.time for r in results if r.time >= 0])) if results else -1.0
    scores["mean_time_s"] = mean_time
    print(json.dumps(scores, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(scores))


if __name__ == "__main__":
    main()
