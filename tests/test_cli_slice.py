"""Minimum end-to-end slice through the REAL CLI scripts (SURVEY.md §7.4):
render_templates -> extract_retrieval_features -> merge_features ->
(GT-mask proposals) -> dino_inference -> BOP CSV readable + sane.
Runs with tiny models (FREEPOSE_TINY_MODELS=1)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


def _run(args, env_extra=None):
    env = dict(os.environ)
    env["FREEPOSE_TINY_MODELS"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(REPO)
    if env_extra:
        env.update(env_extra)
    r = subprocess.run(
        [sys.executable, "-m", args[0], *args[1:]], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, f"{args[0]} failed:\n{r.stdout}\n{r.stderr}"
    return r


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("slice")
    # --- two tiny meshes -------------------------------------------------- #
    rng = np.random.default_rng(0)
    mesh_dir = ws / "meshes"
    for name in ("meshaaa", "meshbbb"):
        d = mesh_dir / name
        d.mkdir(parents=True)
        n_lat, n_lon = 6, 8
        verts, faces = [], []
        bump = rng.uniform(0.1, 0.3)
        for i in range(n_lat + 1):
            th = np.pi * i / n_lat
            for j in range(n_lon):
                ph = 2 * np.pi * j / n_lon
                r = 1.0 + bump * np.sin(2 * ph) * np.sin(th)
                verts.append([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph), r * np.cos(th)])
        for i in range(n_lat):
            for j in range(n_lon):
                a = i * n_lon + j
                b = i * n_lon + (j + 1) % n_lon
                c = (i + 1) * n_lon + j
                dd = (i + 1) * n_lon + (j + 1) % n_lon
                faces.append(f"f {a+1} {b+1} {c+1}")
                faces.append(f"f {b+1} {dd+1} {c+1}")
        lines = [
            f"v {v[0]} {v[1]} {v[2]} {rng.random()} {rng.random()} {rng.random()}" for v in verts
        ]
        (d / f"{name}.obj").write_text("\n".join(lines + faces))
    filelist = ws / "filelist.txt"
    filelist.write_text("meshaaa\nmeshbbb\n")

    # --- tiny BOP scene --------------------------------------------------- #
    scene = ws / "bop" / "test" / "000001"
    (scene / "rgb").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "mask_visib").mkdir()
    img = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    img[30:80, 50:110] = [200, 60, 60]
    Image.fromarray(img).save(scene / "rgb" / "000000.png")
    depth = np.zeros((120, 160), np.uint16)
    depth[30:80, 50:110] = 8000  # 0.8 m in BOP 0.1mm units
    Image.fromarray(depth).save(scene / "depth" / "000000.png")
    mask = np.zeros((120, 160), np.uint8)
    mask[30:80, 50:110] = 255
    Image.fromarray(mask).save(scene / "mask_visib" / "000000_000000.png")
    (scene / "scene_camera.json").write_text(json.dumps(
        {"0": {"cam_K": [150.0, 0, 80, 0, 150, 60, 0, 0, 1], "depth_scale": 0.1}}
    ))
    (scene / "scene_gt.json").write_text(json.dumps(
        {"0": [{"obj_id": 1, "cam_R_m2c": list(np.eye(3).reshape(-1)), "cam_t_m2c": [0, 0, 800]}]}
    ))

    # --- GT-mask proposals JSON (detector-free path) ---------------------- #
    from freepose_tpu.io.proposals_json import proposal_entry, save_proposals

    entry = proposal_entry(
        np.array([50, 30, 110, 80]), mask > 0, "meshaaa", 0.9, 1, 0, scale=0.1
    )
    save_proposals([entry], ws / "props.json")
    return ws


def test_cli_end_to_end(workspace):
    ws = workspace
    _run([
        "scripts.render_templates", "--mesh-dir", str(ws / "meshes"),
        "--filelist", str(ws / "filelist.txt"), "--out", str(ws / "shards"),
        "--n-poses", "8", "--resolution", "84",
    ])
    assert (ws / "shards" / "shard-000000.tar").exists()

    _run([
        "scripts.extract_retrieval_features", "--wds-dir", str(ws / "shards"),
        "--filelist", str(ws / "filelist.txt"), "--out", str(ws / "feats"),
        "--layer", "2",
    ], env_extra={"FREEPOSE_TEMPLATE_VIEWS": "8"})
    assert (ws / "feats" / "meshaaa.npy").exists()
    feats = np.load(ws / "feats" / "meshaaa.npy")
    assert feats.shape[0] == 8
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)

    _run([
        "scripts.merge_features", "--features-dir", str(ws / "feats"),
        "--filelist", str(ws / "filelist.txt"), "--out", str(ws / "bank.npy"),
    ])
    bank = np.load(ws / "bank.npy")
    assert bank.shape == (2, feats.shape[1])

    _run([
        "scripts.dino_inference", "--dataset", str(ws / "bop"), "--split", "test",
        "--proposals", str(ws / "props.json"), "--wds-dir", str(ws / "shards"),
        "--filelist", str(ws / "filelist.txt"), "--out", str(ws / "poses.csv"),
        "--layer", "2", "--depth-method", "depthmap",
    ], env_extra={"FREEPOSE_TEMPLATE_VIEWS": "8"})

    from freepose_tpu.io.bop_csv import read_results_csv

    results = read_results_csv(ws / "poses.csv", t_scale=1000.0)
    assert len(results) == 1
    r = results[0]
    assert r.scene_id == 1 and r.im_id == 0 and r.obj_id == "meshaaa"
    # Rotation orthonormal, z in a plausible metric range, real time recorded.
    np.testing.assert_allclose(r.R @ r.R.T, np.eye(3), atol=1e-4)
    assert 0.05 < r.t[2] < 20.0
    assert r.time > 0


def test_cli_eval_bop_pose(workspace):
    """Close the loop: evaluate the slice's CSV with the BOP eval driver."""
    ws = workspace
    if not (ws / "poses.csv").exists():
        pytest.skip("dino_inference output missing (ordering)")
    # GT models dir: reuse meshaaa as obj_000001 (mm units like BOP models).
    import shutil

    models = ws / "models"
    models.mkdir(exist_ok=True)
    from freepose_tpu.io.mesh import load_obj, save_obj

    mesh = load_obj(ws / "meshes" / "meshaaa" / "meshaaa.obj").normalized()
    save_obj(mesh.scaled(100.0), models / "obj_000001.obj")  # 0.1 m half-extent in mm
    r = _run([
        "scripts.eval_bop_pose", "--results", str(ws / "poses.csv"),
        "--dataset", str(ws / "bop"), "--split", "test",
        "--models-dir", str(models), "--inference-mesh-dir", str(ws / "meshes"),
        "--errors", "chamfer", "chamfer_proj", "--n-points", "300",
        "--out", str(ws / "scores.json"),
    ])
    scores = json.loads((ws / "scores.json").read_text())
    assert "AR" in scores and 0.0 <= scores["AR"] <= 1.0
    assert "AR_chamfer" in scores and "AR_chamfer_proj" in scores
    assert scores["mean_time_s"] > 0

    # Full BOP19 error set: vsd (tau sweep folded into one AR) + symmetry-
    # aware mssd/mspd, against the workspace's real depth images.
    _run([
        "scripts.eval_bop_pose", "--results", str(ws / "poses.csv"),
        "--dataset", str(ws / "bop"), "--split", "test",
        "--models-dir", str(models), "--inference-mesh-dir", str(ws / "meshes"),
        "--errors", "vsd", "mssd", "mspd", "--n-points", "300",
        "--out", str(ws / "scores_bop19.json"),
    ])
    s2 = json.loads((ws / "scores_bop19.json").read_text())
    for key in ("AR_vsd", "AR_mssd", "AR_mspd", "AR"):
        assert key in s2 and 0.0 <= s2[key] <= 1.0
    assert not any(k.startswith("AR_vsd:") for k in s2)  # taus folded


def test_cli_extract_proposals_gt_masks(workspace):
    """Detector-free proposal generation + retrieval against the bank."""
    ws = workspace
    if not (ws / "bank.npy").exists():
        pytest.skip("bank missing (ordering)")
    _run([
        "scripts.extract_proposals_ground", "--dataset", str(ws / "bop"),
        "--split", "test", "--bank", str(ws / "bank.npy"),
        "--filelist", str(ws / "filelist.txt"), "--out-dir", str(ws),
        "--detector", "gt-masks", "--layer", "2", "--min-mask-px", "100",
    ])
    from freepose_tpu.io.proposals_json import load_proposals, proposal_mask
    from scripts.common import proposals_filename

    name = proposals_filename(0.15, 0.15, "ffa", 2, 0, "bop")
    props = load_proposals(ws / name)
    assert len(props) == 1
    p = props[0]
    assert p["mesh"] in ("meshaaa", "meshbbb")
    assert p["scene_id"] == 1 and p["image_id"] == 0
    mask = proposal_mask(p)
    assert mask[40, 70] and not mask[5, 5]  # matches the GT square


def test_convert_weights_cli_roundtrip(tmp_path):
    """Torch checkpoint -> .npz -> loads into our model, matching outputs."""
    import torch

    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    torch.manual_seed(0)
    hf = Dinov2WithRegistersModel(Dinov2WithRegistersConfig(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=256, patch_size=14, image_size=56, num_register_tokens=4,
        layerscale_value=0.5,
    )).eval()
    ckpt = tmp_path / "dinov2.bin"
    torch.save(hf.state_dict(), ckpt)
    out = tmp_path / "dinov2.npz"
    _run(["scripts.convert_weights", "--kind", "dinov2-hf", "--ckpt", str(ckpt),
          "--layers", "3", "--out", str(out)])

    from scripts.common import load_params
    from freepose_tpu.models.dinov2 import VIT_TEST, DinoV2

    import jax.numpy as jnp

    params = load_params(out)
    img = np.random.default_rng(0).normal(size=(1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(img)).last_hidden_state.numpy()
    ours = np.asarray(DinoV2(VIT_TEST).apply({"params": params}, jnp.asarray(img)))
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_cli_compute_scale(workspace):
    """compute_scale: CLIP-kNN LLM-prior scales land in the proposal JSON."""
    import json

    ws = workspace
    (ws / "prior.json").write_text(json.dumps({
        "a mug": 0.05, "a bowl": 0.08, "a pitcher": 0.12, "a toy car": 0.04,
    }))
    _run([
        "scripts.compute_scale", "--dataset", str(ws / "bop"), "--split", "test",
        "--proposals", str(ws / "props.json"), "--scale-file", str(ws / "prior.json"),
        "--out", str(ws / "props_scaled2.json"),
    ])
    out = json.loads((ws / "props_scaled2.json").read_text())
    assert out and all("scale" in p for p in out)
    assert all(0.01 <= p["scale"] <= 0.2 for p in out)


def test_cli_generate_depth_zoe(workspace):
    """generate_depth_zoe: 16-bit normalized depth PNGs land next to rgb
    (reference generate_depth_zoe.py:14-31 layout)."""
    from pathlib import Path

    import numpy as np
    from PIL import Image

    ws = workspace
    _run([
        "scripts.generate_depth_zoe", "--dataset", str(ws / "bop"), "--split", "test",
    ])
    scene = next((ws / "bop" / "test").iterdir())
    preds = sorted((scene / "depth_pred").glob("*"))
    assert preds, "expected predicted depth PNGs"
    d = np.asarray(Image.open(preds[0]))
    assert d.dtype == np.uint16 and d.ndim == 2
