"""End-to-end VIDEO slice through the real CLIs: synthetic rendered video ->
proposals JSON -> dino_inference_video (coarse+fine tracking) ->
smooth_poses_video (track+PnP+smooth) -> eval_videos drift tables."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image
from scipy.spatial.transform import Rotation as Rot

REPO = Path(__file__).resolve().parent.parent


def _run(args, timeout=1500, extra_env=None):
    env = dict(os.environ)
    env["FREEPOSE_TINY_MODELS"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO)
    env["FREEPOSE_TEMPLATE_VIEWS"] = "8"
    if extra_env:
        env.update(extra_env)
    r = subprocess.run(
        [sys.executable, "-m", args[0], *args[1:]], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"{args[0]} failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    return r


@pytest.fixture(scope="module")
def video_ws(tmp_path_factory):
    from freepose_tpu.geometry.boxes import mask_to_bbox
    from freepose_tpu.io.mesh import TriMesh, pad_mesh, save_obj
    from freepose_tpu.io.proposals_json import proposal_entry, save_proposals
    from freepose_tpu.ops.rasterizer import RasterSettings, rasterize
    from freepose_tpu.geometry.camera import default_video_intrinsics

    import jax.numpy as jnp

    ws = tmp_path_factory.mktemp("video")
    rng = np.random.default_rng(0)

    # Textured blob mesh, saved for the CLIs.
    n_lat, n_lon = 10, 14
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.2 * np.sin(3 * ph) * np.sin(2 * th)
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

    # GT trajectory + rendered frames (240x320).
    n_frames = 5
    h, w = 240, 320
    k = default_video_intrinsics(w, h)
    scale = 0.12
    gt = []
    for t in range(n_frames):
        p = np.eye(4, dtype=np.float32)
        p[:3, :3] = Rot.from_rotvec([0, 0.06 * t, 0.02 * t]).as_matrix()
        p[:3, 3] = [0.02 * t - 0.02, 0.0, 1.2]
        gt.append(p)
    gt = np.stack(gt)
    v, c, f, valid = pad_mesh(mesh.scaled(scale), 512, 1024)
    setts = RasterSettings(resolution=320, tile=32, max_faces_per_tile=256)
    rgb, depth = rasterize(jnp.asarray(v), jnp.asarray(c), jnp.asarray(f), jnp.asarray(valid),
                           jnp.asarray(gt), jnp.asarray(k, jnp.float32), setts)
    frames_dir = ws / "frames"
    frames_dir.mkdir()
    props = []
    for t in range(n_frames):
        frame = np.asarray(rgb[t])[:h, :w]
        mask = np.asarray(depth[t])[:h, :w] > 0
        Image.fromarray((frame * 255).astype(np.uint8)).save(frames_dir / f"{t:06d}.png")
        bbox = np.asarray(mask_to_bbox(jnp.asarray(mask)))
        entry = proposal_entry(bbox, mask, "blobmesh", 0.9, 0, t, scale=scale)
        entry["track_id"] = 0
        props.append(entry)
    from freepose_tpu.io.proposals_json import save_proposals

    save_proposals(props, ws / "props.json")

    # Template shards for the coarse estimator.
    _run([
        "scripts.render_templates", "--mesh-dir", str(ws / "meshes"),
        "--filelist", str(ws / "filelist.txt"), "--out", str(ws / "shards"),
        "--n-poses", "8", "--resolution", "84",
    ])

    # Video GT npy for eval_videos.
    gt_dir = ws / "gt"
    gt_dir.mkdir()
    np.save(gt_dir / "vid_poses_id0.npy",
            {"poses": gt, "bboxes": np.zeros((n_frames, 4)), "mesh_id": "blobmesh",
             "focal_length": float(np.asarray(k)[0, 0])}, allow_pickle=True)
    return ws


def test_video_pipeline_end_to_end(video_ws):
    ws = video_ws
    _run([
        "scripts.dino_inference_video", "--video-dir", str(ws / "frames"),
        "--proposals", str(ws / "props.json"), "--wds-dir", str(ws / "shards"),
        "--filelist", str(ws / "filelist.txt"), "--mesh-dir", str(ws / "meshes"),
        "--out", str(ws / "vid.csv"), "--layer", "2",
        "--n-coarse", "8", "--n-fine", "64", "--n-neighbors", "16",
        "--neighborhood", "40",
    ])
    from freepose_tpu.io.bop_csv import read_results_csv

    track = read_results_csv(ws / "vid.csv", t_scale=1.0)
    assert len(track) == 5
    assert all(np.isfinite(r.t).all() for r in track)
    zs = [r.t[2] for r in track]
    assert all(0.2 < z < 6.0 for z in zs), zs

    _run([
        "scripts.smooth_poses_video", "--video-dir", str(ws / "frames"),
        "--poses", str(ws / "vid.csv"), "--mesh-dir", str(ws / "meshes"),
        "--out", str(ws / "vid-tracked.csv"), "--interval", "3",
    ])
    refined = read_results_csv(ws / "vid-tracked.csv", t_scale=1.0)
    assert len(refined) == 5
    for r in refined:
        np.testing.assert_allclose(r.R @ r.R.T, np.eye(3), atol=1e-3)

    _run([
        "scripts.eval_videos", "--gt-dir", str(ws / "gt"),
        "--results-dir", str(ws),
        "--methods", "coarse={video}.csv", "tracked={video}-tracked.csv",
        "--width", "320", "--height", "240",
        "--out-dir", str(ws / "tables"),
    ])
    import pandas as pd

    rot = pd.read_csv(ws / "tables" / "results_mean.csv", index_col=0)
    assert np.isfinite(rot.values).all()


def test_video_inference_no_rescore_dumps_scores(video_ws):
    """--no-rescore runs the coarse estimator every frame and dumps the full
    per-view score landscape (reference dino_inference_video.py:158-180:
    all_scores.npy [n_obj, n_frames, V] + all_poses.npy [V, 4, 4])."""
    ws = video_ws
    out = ws / "nore" / "vid.csv"
    _run([
        "scripts.dino_inference_video", "--video-dir", str(ws / "frames"),
        "--proposals", str(ws / "props.json"), "--wds-dir", str(ws / "shards"),
        "--filelist", str(ws / "filelist.txt"), "--mesh-dir", str(ws / "meshes"),
        "--out", str(out), "--layer", "2",
        "--n-coarse", "8", "--n-fine", "64", "--n-neighbors", "16",
        "--no-rescore",
    ])
    scores = np.load(out.parent / "all_scores.npy")
    poses = np.load(out.parent / "all_poses.npy")
    assert scores.shape == (1, 5, 8)
    assert np.isfinite(scores).all() and np.abs(scores).max() <= 1.0 + 1e-5
    assert poses.shape == (8, 4, 4)
    from freepose_tpu.io.bop_csv import read_results_csv

    track = read_results_csv(out, t_scale=1.0)
    assert len(track) == 5


def test_smooth_cotracker2_tracker_cli(video_ws):
    """smooth_poses_video --tracker cotracker2 with a small-rig
    --tracker-config JSON: the production CoTracker2 path (predictor
    front end + TrackingRefiner wiring) must run end-to-end and emit valid
    orthonormal poses. Pixel ACCURACY of this path is bounded by
    tests/test_cotracker2.py::test_production_predictor_px_accuracy."""
    import dataclasses as dc

    from freepose_tpu.models.cotracker2 import COTRACKER2_TEST, CoTracker2Predictor

    ws = video_ws
    cfg = dc.replace(COTRACKER2_TEST, model_resolution=(48, 64))
    cfg_json = {
        f.name: getattr(cfg, f.name) for f in dc.fields(cfg)
        if f.name not in ("dtype", "precision")
    }
    cfg_json["model_resolution"] = list(cfg.model_resolution)
    (ws / "ct2_cfg.json").write_text(json.dumps(cfg_json))
    params = CoTracker2Predictor.init_params(cfg)
    import jax

    flat = {"/".join(p.key for p in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)}
    np.savez(ws / "ct2.npz", **flat)
    # Self-contained coarse track (GT poses) — no dependency on earlier tests.
    from freepose_tpu.io.bop_csv import PoseResult, write_results_csv

    results = []
    for t in range(5):
        R = Rot.from_rotvec([0, 0.06 * t, 0.02 * t]).as_matrix()
        results.append(PoseResult(
            scene_id=0, im_id=t, obj_id="blobmesh", score=0.9, R=R,
            t=np.array([0.02 * t - 0.02, 0.0, 1.2]),
            bbox_visib=np.array([0, 0, 10, 10]), scale=0.12, time=0.01,
        ))
    write_results_csv(results, ws / "ct2-coarse.csv", t_scale=1.0)
    _run([
        "scripts.smooth_poses_video", "--video-dir", str(ws / "frames"),
        "--poses", str(ws / "ct2-coarse.csv"), "--mesh-dir", str(ws / "meshes"),
        "--out", str(ws / "vid-ct2.csv"), "--interval", "3",
        "--tracker", "cotracker2", "--tracker-weights", str(ws / "ct2.npz"),
        "--tracker-config", str(ws / "ct2_cfg.json"),
    ])
    from freepose_tpu.io.bop_csv import read_results_csv

    refined = read_results_csv(ws / "vid-ct2.csv", t_scale=1.0)
    assert len(refined) == 5
    for r in refined:
        np.testing.assert_allclose(r.R @ r.R.T, np.eye(3), atol=1e-3)
        assert np.isfinite(r.t).all()


def test_video_proposals_cli_runs(video_ws):
    """extract_proposals_ground_video end-to-end: frame-0 boxes -> SAM2
    propagation -> FFA retrieval -> soft voting -> proposal JSON. With
    random-init SAM2 weights the propagated masks are empty (near-zero
    logits), so this asserts the full flow executes and emits valid JSON;
    mask/propagation CORRECTNESS is covered by the HF-parity tests in
    test_sam2_video.py and the predictor tests."""
    ws = video_ws
    rng = np.random.default_rng(0)
    props = json.loads((ws / "props.json").read_text())
    x, y, bw, bh = props[0]["bbox"]
    np.save(ws / "boxes0.npy", np.array([[x, y, x + bw, y + bh]], np.float32))
    bank = rng.standard_normal((4, 64)).astype(np.float32)  # VIT_TEST hidden
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    np.save(ws / "bank.npy", bank)
    (ws / "banklist.txt").write_text("m0\nm1\nm2\nblobmesh\n")
    r = _run([
        "scripts.extract_proposals_ground_video", "--video-dir", str(ws / "frames"),
        "--bank", str(ws / "bank.npy"), "--filelist", str(ws / "banklist.txt"),
        "--out", str(ws / "vprops.json"), "--detector", "boxes",
        "--boxes", str(ws / "boxes0.npy"), "--min-mask-px", "0",
    ])
    out = json.loads((ws / "vprops.json").read_text())
    assert isinstance(out, list)
    for p in out:  # any surviving masks must be valid BOP entries
        assert {"bbox", "segmentation", "mesh", "image_id"} <= set(p)
        assert p["mesh"] in {"m0", "m1", "m2", "blobmesh"}
    # --shard-objects: the object axis of the SAM2 propagation shards over
    # an 8-virtual-device mesh; the CLI must produce the identical JSON.
    _run([
        "scripts.extract_proposals_ground_video", "--video-dir", str(ws / "frames"),
        "--bank", str(ws / "bank.npy"), "--filelist", str(ws / "banklist.txt"),
        "--out", str(ws / "vprops-sharded.json"), "--detector", "boxes",
        "--boxes", str(ws / "boxes0.npy"), "--min-mask-px", "0", "--shard-objects",
    ], extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    sharded = json.loads((ws / "vprops-sharded.json").read_text())
    assert sharded == out


def test_compute_scale_video_cli(video_ws):
    """compute_scale_video: CLIP-kNN over an LLM scale prior -> per-proposal
    'scale' field (constant per track, reference compute_scale_video.py
    89-95 median-over-frames)."""
    ws = video_ws
    (ws / "prior.json").write_text(json.dumps({
        "a mug": 0.05, "a bowl": 0.08, "a pitcher": 0.12, "a toy car": 0.04,
        "a ball": 0.1, "a cup": 0.06,
    }))
    _run([
        "scripts.compute_scale_video", "--video-dir", str(ws / "frames"),
        "--proposals", str(ws / "props.json"), "--scale-file", str(ws / "prior.json"),
        "--out", str(ws / "props_scaled.json"),
    ])
    out = json.loads((ws / "props_scaled.json").read_text())
    assert len(out) == 5
    scales = {p["scale"] for p in out}
    assert len(scales) == 1, "video scale must be constant per track"
    s = next(iter(scales))
    assert 0.01 <= s <= 0.2, s  # within the prior's range


def test_vis_poses_video_cli(video_ws):
    """vis_poses_video: pose overlays render for every frame of a track."""
    ws = video_ws
    from freepose_tpu.io.bop_csv import PoseResult, write_results_csv
    from scipy.spatial.transform import Rotation as Rot

    results = []
    for t in range(5):
        R = Rot.from_rotvec([0, 0.06 * t, 0.02 * t]).as_matrix()
        results.append(PoseResult(
            scene_id=0, im_id=t, obj_id="blobmesh", score=0.9, R=R,
            t=np.array([0.02 * t - 0.02, 0.0, 1.2]),
            bbox_visib=np.array([0, 0, 10, 10]), scale=0.12, time=0.01,
        ))
    write_results_csv(results, ws / "gtposes.csv", t_scale=1.0)
    _run([
        "scripts.vis_poses_video", "--video-dir", str(ws / "frames"),
        "--poses", str(ws / "gtposes.csv"), "--mesh-dir", str(ws / "meshes"),
        "--out-dir", str(ws / "overlays"), "--render-size", "160",
    ])
    outs = list((ws / "overlays").glob("*"))
    assert len(outs) == 5


def test_vis_features_cli(video_ws):
    """vis_features: PCA feature panels for input images."""
    ws = video_ws
    _run([
        "scripts.vis_features", "--images", str(ws / "frames" / "000000.png"),
        "--out", str(ws / "feat_panel.png"), "--model", "vitb", "--layer", "2",
    ])
    assert (ws / "feat_panel.png").exists()


def test_video_inference_shard_refine_matches(video_ws):
    """--shard-refine (neighbor fan-out over the 8-device mesh) produces the
    same track as the default single-device path (the fine cache is disabled
    in both runs so the compute paths are comparable)."""
    ws = video_ws
    common = [
        "scripts.dino_inference_video", "--video-dir", str(ws / "frames"),
        "--proposals", str(ws / "props.json"), "--wds-dir", str(ws / "shards"),
        "--filelist", str(ws / "filelist.txt"), "--mesh-dir", str(ws / "meshes"),
        "--layer", "2", "--n-coarse", "8", "--n-fine", "64",
        "--n-neighbors", "16", "--neighborhood", "40", "--fine-cache", "0",
    ]
    _run([*common, "--out", str(ws / "vid-single.csv")])
    _run([*common, "--out", str(ws / "vid-sharded.csv"), "--shard-refine"])
    from freepose_tpu.io.bop_csv import read_results_csv

    single = read_results_csv(ws / "vid-single.csv", t_scale=1.0)
    sharded = read_results_csv(ws / "vid-sharded.csv", t_scale=1.0)
    assert len(single) == len(sharded) == 5
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a.R, b.R, atol=1e-4)
        np.testing.assert_allclose(a.t, b.t, atol=1e-4)
    # Composed mode: fine cache + sharding together (cache buffers replicate,
    # miss batches shard) must also reproduce the same track.
    composed = [a for a in common if a != "--fine-cache"]
    composed.remove("0")
    _run([*composed, "--out", str(ws / "vid-composed.csv"), "--shard-refine"])
    comp = read_results_csv(ws / "vid-composed.csv", t_scale=1.0)
    for a, b in zip(single, comp):
        np.testing.assert_allclose(a.R, b.R, atol=1e-4)
        np.testing.assert_allclose(a.t, b.t, atol=1e-4)


def test_video_inference_chain_matches(video_ws):
    """--chain-refine (the default: autonomous device-cache chain) produces
    the same track as the serial cached path (--chain-refine 0)."""
    ws = video_ws
    common = [
        "scripts.dino_inference_video", "--video-dir", str(ws / "frames"),
        "--proposals", str(ws / "props.json"), "--wds-dir", str(ws / "shards"),
        "--filelist", str(ws / "filelist.txt"), "--mesh-dir", str(ws / "meshes"),
        "--layer", "2", "--n-coarse", "8", "--n-fine", "64",
        "--n-neighbors", "16", "--neighborhood", "40",
    ]
    _run([*common, "--out", str(ws / "vid-chain.csv")])
    _run([*common, "--out", str(ws / "vid-serial.csv"), "--chain-refine", "0"])
    from freepose_tpu.io.bop_csv import read_results_csv

    chain = read_results_csv(ws / "vid-chain.csv", t_scale=1.0)
    serial = read_results_csv(ws / "vid-serial.csv", t_scale=1.0)
    assert len(chain) == len(serial) == 5
    for a, b in zip(serial, chain):
        assert (a.im_id, str(a.obj_id)) == (b.im_id, str(b.obj_id))
        np.testing.assert_allclose(b.R, a.R, atol=1e-4)
        np.testing.assert_allclose(b.t, a.t, atol=1e-4)
