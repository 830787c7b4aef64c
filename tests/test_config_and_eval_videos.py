"""PipelineConfig round trip + eval_videos CLI on synthetic GT/CSV."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
from scipy.spatial.transform import Rotation as Rot

from freepose_tpu.config import PipelineConfig
from freepose_tpu.io.bop_csv import PoseResult, write_results_csv

REPO = Path(__file__).resolve().parent.parent


def test_config_roundtrip(tmp_path):
    cfg = PipelineConfig(fine_neighborhood_deg=20.0, retrieval_topk=50)
    cfg.save(tmp_path / "cfg.json")
    back = PipelineConfig.load(tmp_path / "cfg.json")
    assert back == cfg
    # Unknown keys are ignored (forward compatibility).
    data = json.loads((tmp_path / "cfg.json").read_text())
    data["bogus"] = 1
    (tmp_path / "cfg.json").write_text(json.dumps(data))
    assert PipelineConfig.load(tmp_path / "cfg.json") == cfg


def test_canonical_video_set_matches_reference():
    """The default video list IS the reference's canonical 32-video benchmark
    (reference scripts/eval_videos.py:118-151) and the default method
    patterns are the paper's 6 comparison methods (:240-256)."""
    import ast
    import re

    from scripts.eval_videos import DEFAULT_METHODS, DEFAULT_VIDEOS

    assert len(DEFAULT_VIDEOS) == 32
    assert len(DEFAULT_METHODS) == 6
    assert [n for n, _ in DEFAULT_METHODS] == [
        "MegaPose coarse", "MegaPose fine", "GigaPose", "FoundPose",
        "Ours coarse", "Ours fine",
    ]
    ref = Path("/root/reference/scripts/eval_videos.py")
    if not ref.exists():
        import pytest

        pytest.skip("reference tree not present")
    src = ref.read_text()
    m = re.search(r"video_names = (\[[^\]]*\])", src)
    assert m, "reference video_names list not found"
    assert DEFAULT_VIDEOS == ast.literal_eval(m.group(1))
    m = re.search(r"args\.patterns = (\[[^\]]*\])", src)
    assert m, "reference default patterns not found"
    assert [p for _, p in DEFAULT_METHODS] == ast.literal_eval(m.group(1))


def test_eval_videos_cli(tmp_path):
    n = 24
    rng = np.random.default_rng(0)
    axis = np.array([0.2, 0.5, 0.8])
    axis /= np.linalg.norm(axis)
    rots = Rot.from_rotvec(np.outer(np.arange(n) * 0.03, axis)).as_matrix()
    ts = np.stack([0.05 * np.sin(np.arange(n) * 0.2), np.zeros(n), 1.5 + 0.01 * np.arange(n)], 1)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :3] = rots
    poses[:, :3, 3] = ts

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    np.save(gt_dir / "vidA_poses_id0.npy", {"poses": poses, "bboxes": np.zeros((n, 4)), "mesh_id": "m", "focal_length": 600.0}, allow_pickle=True)

    res_dir = tmp_path / "results"
    res_dir.mkdir()
    # Method "perfect": GT poses; method "noisy": drifting rotations.
    for name, noise in (("perfect", 0.0), ("noisy", 0.1)):
        results = []
        for i in range(n):
            r = rots[i] @ Rot.from_rotvec([0, 0, noise * i]).as_matrix()
            results.append(PoseResult(0, i, "m", 1.0, r, ts[i], scale=0.15, time=0.1))
        write_results_csv(results, res_dir / f"vidA-{name}.csv", t_scale=1.0)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO)
    r = subprocess.run(
        [sys.executable, "-m", "scripts.eval_videos", "--gt-dir", str(gt_dir),
         "--results-dir", str(res_dir),
         "--methods", "perfect=vidA-perfect.csv".replace("vidA", "{video}"),
         "noisy=vidA-noisy.csv".replace("vidA", "{video}"),
         "--out-dir", str(tmp_path / "tables")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    import pandas as pd

    rot = pd.read_csv(tmp_path / "tables" / "results_rot.csv", index_col=0)
    assert rot.loc["vidA", "perfect"] < 1e-5
    assert rot.loc["vidA", "noisy"] > rot.loc["vidA", "perfect"]
    assert (tmp_path / "tables" / "results_mean.csv").exists()
