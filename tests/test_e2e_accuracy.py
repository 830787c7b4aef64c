"""End-to-end KNOWN-GT accuracy gate (VERDICT r3 #2).

The reference's implicit validation is running the full chain and scoring it
against GT (reference scripts/eval_videos.py:154-226,
src/utils/video_evaluation.py:4-34). The CLI slice tests assert only
validity/self-consistency; THIS test asserts the composed pipeline *tracks*:
a textured mesh is rendered along an analytic SE(3) trajectory (GT known by
construction), the full CLI chain runs with the deterministic/weight-free
paths (GT-mask proposals, tiny random-init DINOv2 — the query frames ARE
renders of the same mesh, so feature matching is meaningful without released
weights; ZNCC point tracking is weight-free), and the resulting tracks must
stay within rotation / projection / depth drift thresholds that a
stopped-tracking failure (random relative rotations drift ~90 deg) blows
through by an order of magnitude.
"""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent

N_FRAMES = 16
H, W = 240, 320
SCALE = 0.12
DEG_PER_FRAME = 2.0
N_COARSE = 8
N_FINE = 2000


def _run(args, timeout=2400, extra_env=None):
    env = dict(os.environ)
    env["FREEPOSE_TINY_MODELS"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO)
    env["FREEPOSE_TEMPLATE_VIEWS"] = str(N_COARSE)
    if extra_env:
        env.update(extra_env)
    r = subprocess.run(
        [sys.executable, "-m", args[0], *args[1:]], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"{args[0]} failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    return r


def _axis_angle(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.radians(deg)
    kx, ky, kz = axis
    km = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
    return (np.eye(3) + np.sin(a) * km + (1 - np.cos(a)) * km @ km).astype(np.float32)


@pytest.fixture(scope="module")
def gt_ws(tmp_path_factory):
    """16-frame synthetic video along an analytic trajectory: mesh + frames
    + GT-mask proposals + template shards + GT npy."""
    import jax.numpy as jnp

    from freepose_tpu.geometry.boxes import mask_to_bbox
    from freepose_tpu.geometry.camera import default_video_intrinsics
    from freepose_tpu.geometry.rotation import template_poses
    from freepose_tpu.io.mesh import TriMesh, pad_mesh, save_obj
    from freepose_tpu.io.proposals_json import proposal_entry, save_proposals
    from freepose_tpu.ops.rasterizer import RasterSettings, rasterize

    ws = tmp_path_factory.mktemp("gt_video")
    rng = np.random.default_rng(7)

    n_lat, n_lon = 12, 16
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.25 * np.sin(3 * ph) * np.sin(2 * th)
            verts.append([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph), r * np.cos(th)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    mesh = TriMesh(
        np.asarray(verts, np.float32), np.asarray(faces, np.int32),
        rng.random((len(verts), 3)).astype(np.float32),
    )
    mesh_dir = ws / "meshes" / "blobmesh"
    mesh_dir.mkdir(parents=True)
    save_obj(mesh, mesh_dir / "blobmesh.obj")
    (ws / "filelist.txt").write_text("blobmesh\n")

    # Analytic trajectory: frame-0 rotation sits ON a coarse template view
    # (the frame-0 query is then a near-copy of that render, anchoring the
    # coarse match deterministically), 2 deg/frame about a wobbling axis,
    # slow lateral drift at constant depth.
    k = default_video_intrinsics(W, H)
    r0 = np.asarray(template_poses(N_COARSE))[3][:3, :3]
    gt = []
    axis = np.array([0.2, 1.0, 0.3])
    for t in range(N_FRAMES):
        p = np.eye(4, dtype=np.float32)
        r = r0.copy()
        for _ in range(t):
            r = _axis_angle(axis, DEG_PER_FRAME) @ r
        p[:3, :3] = r
        p[:3, 3] = [0.015 * t - 0.1, 0.008 * t, 1.2]
        gt.append(p)
    gt = np.stack(gt)

    v, c, f, valid = pad_mesh(mesh.scaled(SCALE), 512, 1024)
    setts = RasterSettings(resolution=320, tile=32, max_faces_per_tile=256)
    rgb, depth = rasterize(
        jnp.asarray(v), jnp.asarray(c), jnp.asarray(f), jnp.asarray(valid),
        jnp.asarray(gt), jnp.asarray(k, jnp.float32), setts)
    frames_dir = ws / "frames"
    frames_dir.mkdir()
    props = []
    for t in range(N_FRAMES):
        frame = np.asarray(rgb[t])[:H, :W]
        mask = np.asarray(depth[t])[:H, :W] > 0
        Image.fromarray((frame * 255).astype(np.uint8)).save(frames_dir / f"{t:06d}.png")
        bbox = np.asarray(mask_to_bbox(jnp.asarray(mask)))
        entry = proposal_entry(bbox, mask, "blobmesh", 0.9, 0, t, scale=SCALE)
        entry["track_id"] = 0
        props.append(entry)
    save_proposals(props, ws / "props.json")

    _run([
        "scripts.render_templates", "--mesh-dir", str(ws / "meshes"),
        "--filelist", str(ws / "filelist.txt"), "--out", str(ws / "shards"),
        "--n-poses", str(N_COARSE), "--resolution", "84",
    ])

    gt_dir = ws / "gt"
    gt_dir.mkdir()
    np.save(gt_dir / "vid_poses_id0.npy",
            {"poses": gt, "bboxes": np.zeros((N_FRAMES, 4)), "mesh_id": "blobmesh",
             "focal_length": float(np.asarray(k)[0, 0])}, allow_pickle=True)
    return ws, gt, np.asarray(k)


def _geodesic_deg(ra, rb):
    tr = np.clip((np.trace(ra.T @ rb) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(tr))


@pytest.fixture(scope="module")
def fine_csv(gt_ws):
    """Coarse+fine inference over the synthetic video (shared by the ZNCC
    and CoTracker2 smooth-chain gates)."""
    ws, gt, k = gt_ws
    _run([
        "scripts.dino_inference_video", "--video-dir", str(ws / "frames"),
        "--proposals", str(ws / "props.json"), "--wds-dir", str(ws / "shards"),
        "--filelist", str(ws / "filelist.txt"), "--mesh-dir", str(ws / "meshes"),
        "--out", str(ws / "vid.csv"), "--layer", "2",
        "--n-coarse", str(N_COARSE), "--n-fine", str(N_FINE),
        "--n-neighbors", "64", "--neighborhood", "40",
    ])
    return ws / "vid.csv"


def _rel_rot_err(track, gt):
    errs = []
    for t in range(N_FRAMES - 1):
        dr_pred = track[t + 1].R @ track[t].R.T
        dr_gt = gt[t + 1, :3, :3] @ gt[t, :3, :3].T
        errs.append(_geodesic_deg(dr_pred, dr_gt))
    return np.array(errs)


def test_full_chain_tracks_known_gt(gt_ws, fine_csv):
    """proposals -> dino_inference_video -> smooth_poses_video -> eval_videos
    must TRACK the analytic trajectory, not just produce valid poses."""
    ws, gt, k = gt_ws
    _run([
        "scripts.smooth_poses_video", "--video-dir", str(ws / "frames"),
        "--poses", str(ws / "vid.csv"), "--mesh-dir", str(ws / "meshes"),
        "--out", str(ws / "vid-tracked.csv"), "--interval", "4",
    ])
    from freepose_tpu.io.bop_csv import read_results_csv

    fine = read_results_csv(ws / "vid.csv", t_scale=1.0)
    tracked = read_results_csv(ws / "vid-tracked.csv", t_scale=1.0)
    fine.sort(key=lambda r: r.im_id)
    tracked.sort(key=lambda r: r.im_id)
    assert len(fine) == len(tracked) == N_FRAMES

    # --- gates (GT known by construction) -------------------------------- #
    # The absolute orientation is coarse-init limited: the 8-view coarse
    # match under random tiny-ViT features can land in a wrong basin that the
    # 40-deg fine neighbourhood never leaves — the REFERENCE has the same
    # property, which is why its video protocol scores RELATIVE-pose drift
    # (src/utils/video_evaluation.py:4-34). Gates below are therefore on
    # relative rotation (does the track co-rotate with GT frame-to-frame),
    # projection and depth — the quantities that explode when a stage stops
    # tracking (random relative rotations average ~90 deg/step here).
    drel_fine = _rel_rot_err(fine, gt)
    drel_trk = _rel_rot_err(tracked, gt)
    z_fine = np.array([fine[t].t[2] for t in range(N_FRAMES)])
    diag = float(np.hypot(W, H))

    def centre_px(t):
        uvw = k @ t
        return uvw[:2] / uvw[2]

    proj_err = np.array([
        np.linalg.norm(centre_px(fine[t].t) - centre_px(gt[t, :3, 3]))
        for t in range(N_FRAMES)
    ]) / diag * 100
    print(f"rel-rot err fine mean/max: {drel_fine.mean():.2f}/{drel_fine.max():.2f} deg/frame")
    print(f"rel-rot err tracked mean/max: {drel_trk.mean():.2f}/{drel_trk.max():.2f} deg/frame")
    print(f"z err mean: {np.abs(z_fine - 1.2).mean():.3f} m; proj err mean {proj_err.mean():.2f}%")

    # Depth from bbox z-lift with the GT scale: within ~15% of the true 1.2 m.
    assert np.abs(z_fine - 1.2).mean() < 0.2, z_fine
    # Projected centre stays on the object (a lost track drifts off-frame).
    assert proj_err.mean() < 3.0, proj_err

    # --- drift gates via the reference protocol (eval_videos) ------------ #
    _run([
        "scripts.eval_videos", "--gt-dir", str(ws / "gt"),
        "--results-dir", str(ws),
        "--methods", "fine={video}.csv", "tracked={video}-tracked.csv",
        "--width", str(W), "--height", str(H),
        "--out-dir", str(ws / "tables"),
    ])
    import pandas as pd

    mean_tbl = pd.read_csv(ws / "tables" / "results_mean.csv", index_col=0)
    print(mean_tbl)
    rot_tbl = pd.read_csv(ws / "tables" / "results_rot.csv", index_col=0)
    proj_tbl = pd.read_csv(ws / "tables" / "results_proj.csv", index_col=0)
    depth_tbl = pd.read_csv(ws / "tables" / "results_depth.csv", index_col=0)
    print(rot_tbl, proj_tbl, depth_tbl, sep="\n")
    for m in ("fine", "tracked"):
        assert float(rot_tbl[m].iloc[0]) < 20.0, rot_tbl  # deg drift per gap
        assert float(proj_tbl[m].iloc[0]) < 6.0, proj_tbl  # % of diagonal
        assert float(depth_tbl[m].iloc[0]) < 0.25, depth_tbl  # scale-normalized
    # Direct frame-to-frame co-rotation gates (stopped tracking ~= 90 deg):
    assert drel_fine.mean() < 10.0, drel_fine
    assert drel_trk.mean() < 10.0, drel_trk


def test_full_chain_tracks_known_gt_cotracker2(gt_ws, fine_csv):
    """The `--tracker cotracker2` PRODUCTION smooth path (the reference's
    tracker, tracking_refiner.py:24,160-166) must pass the SAME composed-chain
    drift gate as the ZNCC default (VERDICT r4 #2). No released checkpoint is
    obtainable offline, so the tracker runs with the crafted
    correlation-argmax weights — the no-checkpoint tracking oracle from
    tests/test_cotracker2.py (bounded there at <4 px on analytic motion) —
    through the full smooth_poses_video CLI: correspondences, sliding-window
    CoTracker2Predictor tracking, EPnP, SE(3) smoothing."""
    import dataclasses
    import json

    import torch

    from freepose_tpu.models import convert
    from freepose_tpu.models.cotracker2 import COTRACKER2_TEST
    from scripts.common import save_params
    from tests.test_cotracker2 import TCoTracker2, _craft_corr_argmax

    ws, gt, k = gt_ws
    cfg = dataclasses.replace(
        COTRACKER2_TEST, corr_radius=2, hidden_size=128,
        model_resolution=(H, W),  # == video res: the resize is identity
    )
    torch.manual_seed(0)
    full = TCoTracker2(cfg).eval()
    _craft_corr_argmax(full, cfg)
    sd = {key: v.detach().numpy() for key, v in full.state_dict().items()}
    save_params(convert.cotracker2_from_hub(sd, depth=cfg.depth), ws / "ct2.npz")
    (ws / "ct2.json").write_text(json.dumps({
        "latent_dim": cfg.latent_dim, "corr_levels": cfg.corr_levels,
        "corr_radius": cfg.corr_radius, "flow_emb_dim": cfg.flow_emb_dim,
        "hidden_size": cfg.hidden_size, "num_heads": cfg.num_heads,
        "depth": cfg.depth, "num_virtual_tracks": cfg.num_virtual_tracks,
        "model_resolution": [H, W], "iters": cfg.iters,
        "precision": "highest",
    }))
    _run([
        "scripts.smooth_poses_video", "--video-dir", str(ws / "frames"),
        "--poses", str(fine_csv), "--mesh-dir", str(ws / "meshes"),
        "--out", str(ws / "vid-ct2.csv"), "--interval", "4",
        "--tracker", "cotracker2", "--tracker-weights", str(ws / "ct2.npz"),
        "--tracker-config", str(ws / "ct2.json"),
    ])
    from freepose_tpu.io.bop_csv import read_results_csv

    tracked = read_results_csv(ws / "vid-ct2.csv", t_scale=1.0)
    tracked.sort(key=lambda r: r.im_id)
    assert len(tracked) == N_FRAMES
    drel = _rel_rot_err(tracked, gt)
    print(f"rel-rot err cotracker2-tracked mean/max: "
          f"{drel.mean():.2f}/{drel.max():.2f} deg/frame")
    # Same gate as the ZNCC tracked path: co-rotation with GT (a stopped or
    # diverged tracker averages ~90 deg/frame relative error here).
    assert drel.mean() < 10.0, drel
    assert np.isfinite(np.stack([r.t for r in tracked])).all()
