"""Every CLI imports and parses --help; light CLIs additionally run on tiny
synthetic inputs (the heavy pipelines have their own end-to-end slices in
test_cli_slice.py / test_cli_video_slice.py)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
ALL_CLIS = sorted(
    p.stem for p in (REPO / "scripts").glob("*.py")
    if p.stem not in ("__init__", "common")
)


def _run(args, timeout=420, check=True):
    env = dict(os.environ)
    env["FREEPOSE_TINY_MODELS"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO)
    r = subprocess.run(
        [sys.executable, "-m", args[0], *args[1:]], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    if check:
        assert r.returncode == 0, f"{args}:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    return r


@pytest.mark.parametrize("name", ALL_CLIS)
def test_cli_help(name):
    _run([f"scripts.{name}", "--help"])


def test_filter_predictions_picks_best_iou(tmp_path):
    """filter_predictions: keeps the track best-matching GT bboxes
    (reference filter_predictions.py:24-50)."""
    from freepose_tpu.io.proposals_json import proposal_entry, save_proposals

    good = np.array([10.0, 10.0, 30.0, 30.0])
    bad = np.array([100.0, 100.0, 20.0, 20.0])
    props = []
    for t in range(3):
        for tid, bb in ((0, good), (1, bad)):
            e = proposal_entry(
                np.array([bb[0], bb[1], bb[0] + bb[2], bb[1] + bb[3]]),
                np.zeros((120, 160), bool), f"mesh{tid}", 0.9, 0, t, scale=0.1,
            )
            e["track_id"] = tid
            props.append(e)
    save_proposals(props, tmp_path / "props.json")
    np.save(tmp_path / "gt.npy",
            {"bboxes": np.tile(good, (3, 1)), "poses": np.tile(np.eye(4), (3, 1, 1)),
             "mesh_id": "x", "focal_length": 100.0}, allow_pickle=True)
    _run(["scripts.filter_predictions", "--proposals", str(tmp_path / "props.json"),
          "--gt", str(tmp_path / "gt.npy"), "--out", str(tmp_path / "best.json")])
    best = json.loads((tmp_path / "best.json").read_text())
    assert len(best) == 3 and all(p["mesh"] == "mesh0" for p in best)


def test_resize_meshes_normalizes(tmp_path):
    from freepose_tpu.io.mesh import TriMesh, load_obj, save_obj

    rng = np.random.default_rng(0)
    v = rng.uniform(-3, 5, (16, 3)).astype(np.float32)
    f = rng.integers(0, 16, (20, 3)).astype(np.int32)
    d = tmp_path / "meshes" / "m1"
    d.mkdir(parents=True)
    save_obj(TriMesh(v, f, rng.random((16, 3)).astype(np.float32)), d / "m1.obj")
    _run(["scripts.resize_meshes", "--mesh-dir", str(tmp_path / "meshes"),
          "--out", str(tmp_path / "out")])
    m = load_obj(tmp_path / "out" / "m1" / "m1.obj")
    half = np.abs(m.vertices).max()
    assert abs(half - 1.0) < 1e-3  # unit half-extent (reference resize_meshes.py:10-47)
    center = (m.vertices.max(0) + m.vertices.min(0)) / 2
    np.testing.assert_allclose(center, 0.0, atol=1e-3)


def test_vis_detections_video_writes_overlays(tmp_path):
    from freepose_tpu.io.proposals_json import proposal_entry, save_proposals

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for t in range(2):
        Image.fromarray(rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)).save(
            frames / f"{t:06d}.jpg")
    props = []
    for t in range(2):
        e = proposal_entry(np.array([10.0, 10.0, 50.0, 40.0]),
                           np.zeros((60, 80), bool), "m", 0.9, 0, t, scale=0.1)
        e["track_id"] = 0
        props.append(e)
    save_proposals(props, tmp_path / "props.json")
    _run(["scripts.vis_detections_video", "--video-dir", str(frames),
          "--proposals", str(tmp_path / "props.json"),
          "--out-dir", str(tmp_path / "vis")])
    outs = list((tmp_path / "vis").glob("*"))
    assert len(outs) == 2
