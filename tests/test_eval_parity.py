"""AR parity oracle: our eval driver vs the vendored reference bop_toolkit.

Builds ONE synthetic BOP dataset (lm/test layout), a retrieval-mesh cache and
a results CSV, then scores it twice:

  1. with the reference's modified bop_toolkit (pure numpy/sklearn, run as
     subprocesses of /root/reference/bop_toolkit/scripts/eval_calc_errors.py +
     eval_calc_scores.py, aggregated like eval_bop19_pose.py:241-276), and
  2. with our scripts/eval_bop_pose.py driver,

and asserts the per-error average recalls and the overall AR agree. The
toolkit's missing third-party deps (trimesh/pypng/pytz) are provided as tiny
stubs on PYTHONPATH — eval only ever touches trimesh.load for raw vertices.

cus/vsd need the toolkit's GL renderer (vispy, unavailable headless), so the
oracle covers chamfer + chamfer_proj — the distance errors whose association,
validity, normalization and matching semantics carry all protocol weight;
cus shares every one of those code paths (eval_calc_scores.py:261-273 only
skips the normalization step for it).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/bop_toolkit")
REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference toolkit not present")

# --------------------------------------------------------------------- #
# Third-party stubs for the toolkit (only the surface eval actually uses).

_TRIMESH_STUB = '''\
"""Minimal trimesh stand-in: load() -> object with vertices/faces. ASCII
PLY/OBJ only (the test writes both)."""
import numpy as np


class _Visual:
    kind = None


class _Mesh:
    def __init__(self, v, f):
        self.vertices = np.asarray(v, np.float64)
        self.faces = np.asarray(f, np.int64).reshape(-1, 3)
        self.vertex_normals = np.zeros_like(self.vertices)
        self.visual = _Visual()

    def apply_scale(self, s):
        self.vertices = self.vertices * float(s)


def load(path, **kw):
    path = str(path)
    verts, faces = [], []
    if path.endswith(".obj"):
        for line in open(path):
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(x) for x in t[1:4]])
            elif t[0] == "f":
                faces.append([int(x.split("/")[0]) - 1 for x in t[1:4]])
    elif path.endswith(".ply"):
        lines = open(path).read().splitlines()
        n_v = n_f = 0
        for i, line in enumerate(lines):
            if line.startswith("element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith("element face"):
                n_f = int(line.split()[-1])
            elif line.strip() == "end_header":
                body = i + 1
                break
        for line in lines[body : body + n_v]:
            verts.append([float(x) for x in line.split()[:3]])
        for line in lines[body + n_v : body + n_v + n_f]:
            t = line.split()
            faces.append([int(x) for x in t[1:4]])
    else:
        raise ValueError(path)
    return _Mesh(verts, faces)
'''

_PYTZ_STUB = '''\
import datetime


class _UTC(datetime.tzinfo):
    def utcoffset(self, dt):
        return datetime.timedelta(0)

    def dst(self, dt):
        return datetime.timedelta(0)

    def localize(self, dt):
        return dt.replace(tzinfo=self)


utc = _UTC()


def timezone(name):
    return utc
'''

_PNG_STUB = "class Writer:\n    def __init__(self, *a, **k):\n        raise NotImplementedError('png stub')\n"


# --------------------------------------------------------------------- #
# Synthetic world.


def _rot(axis, deg):
    from scipy.spatial.transform import Rotation

    return Rotation.from_euler(axis, deg, degrees=True).as_matrix()


def _write_ply(path: Path, verts_mm: np.ndarray, faces: np.ndarray) -> None:
    lines = [
        "ply", "format ascii 1.0",
        f"element vertex {len(verts_mm)}",
        "property float x", "property float y", "property float z",
        f"element face {len(faces)}", "property list uchar int vertex_indices",
        "end_header",
    ]
    lines += [" ".join(f"{x:.6f}" for x in v) for v in verts_mm]
    lines += ["3 " + " ".join(str(i) for i in f) for f in faces]
    path.write_text("\n".join(lines) + "\n")


def _write_obj(path: Path, verts: np.ndarray, faces: np.ndarray) -> None:
    lines = [f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}" for v in verts]
    lines += [f"f {f[0]+1} {f[1]+1} {f[2]+1}" for f in faces]
    path.write_text("\n".join(lines) + "\n")


def _blob(seed: int, n: int = 24, scale: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """Random point blob + arbitrary tri fan (faces irrelevant to chamfer)."""
    rng = np.random.default_rng(seed)
    v = (rng.random((n, 3)) - 0.5) * 2.0 * scale
    f = np.stack([np.zeros(n - 2, int), np.arange(1, n - 1), np.arange(2, n)], 1)
    return v, f


def _diameter(v: np.ndarray) -> float:
    d2 = ((v[:, None] - v[None]) ** 2).sum(-1)
    return float(np.sqrt(d2.max()))


K = np.array([[572.4, 0.0, 325.3], [0.0, 573.6, 242.0], [0.0, 0.0, 1.0]])


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalparity")
    ds = root / "bop" / "lm"
    scene = ds / "test" / "000001"
    (scene / "rgb").mkdir(parents=True)
    models = ds / "models_eval"
    models.mkdir()
    inf_dir = root / "inference_meshes"

    # GT models (mm): toolkit loads all 15 lm ids.
    gt_verts = {}
    models_info = {}
    for obj_id in range(1, 16):
        v, f = _blob(obj_id, scale=40.0)  # ~80mm objects
        gt_verts[obj_id] = v
        _write_ply(models / f"obj_{obj_id:06d}.ply", v, f)
        models_info[obj_id] = {"diameter": _diameter(v)}
    (models / "models_info.json").write_text(json.dumps(models_info))

    # Retrieval meshes (unit scale), ids disjoint from GT ids.
    inf_verts = {}
    for inf_id in (101, 102, 103):
        v, f = _blob(100 + inf_id, scale=1.0)
        inf_verts[inf_id] = v
        d = inf_dir / str(inf_id)
        d.mkdir(parents=True)
        _write_obj(d / f"{inf_id}.obj", v, f)

    # Scene: 3 images; classes 1 (two instances) and 2 (one instance).
    rng = np.random.default_rng(7)
    gts, infos, cams = {}, {}, {}
    from PIL import Image

    gt_layout = {
        0: [(1, 0.9), (1, 0.4), (2, 0.8)],
        1: [(1, 0.7), (2, 0.95), (2, 0.2)],
        2: [(1, 0.6)],
    }
    gt_poses = {}
    for im_id, instances in gt_layout.items():
        Image.fromarray(np.zeros((480, 640, 3), np.uint8)).save(
            scene / "rgb" / f"{im_id:06d}.png"
        )
        cams[str(im_id)] = {"cam_K": K.reshape(-1).tolist(), "depth_scale": 0.1}
        gts[str(im_id)] = []
        infos[str(im_id)] = []
        for j, (obj_id, visib) in enumerate(instances):
            r = _rot("xyz", rng.uniform(-180, 180, 3))
            t = np.array([rng.uniform(-60, 60), rng.uniform(-40, 40), rng.uniform(900, 1100)])
            gt_poses[(im_id, len(gts[str(im_id)]))] = (r, t)
            gts[str(im_id)].append(
                {
                    "obj_id": obj_id,
                    "cam_R_m2c": r.reshape(-1).tolist(),
                    "cam_t_m2c": t.tolist(),
                }
            )
            infos[str(im_id)].append(
                {"visib_fract": visib, "bbox_visib": [10 + 5 * j, 20, 80, 60]}
            )
    (scene / "scene_gt.json").write_text(json.dumps(gts))
    (scene / "scene_gt_info.json").write_text(json.dumps(infos))
    (scene / "scene_camera.json").write_text(json.dumps(cams))

    # Targets: im0 wants only the most-visible obj-1 instance; im1 both of
    # class 2 + class 1; im2 the lone instance.
    targets = [
        {"scene_id": 1, "im_id": 0, "obj_id": 1, "inst_count": 1},
        {"scene_id": 1, "im_id": 0, "obj_id": 2, "inst_count": 1},
        {"scene_id": 1, "im_id": 1, "obj_id": 1, "inst_count": 1},
        {"scene_id": 1, "im_id": 1, "obj_id": 2, "inst_count": 2},
        {"scene_id": 1, "im_id": 2, "obj_id": 1, "inst_count": 1},
    ]
    (ds / "test_targets_bop19.json").write_text(json.dumps(targets))

    # Estimates: per image a spread of qualities/scales, ids from the
    # retrieval cache (no correspondence with GT ids — the protocol's point).
    rows = []
    est_layout = {  # im_id -> [(inf_id, gt_like, rot_err_deg, t_err_mm, score)]
        0: [(101, 0, 4, 3, 0.9), (102, 2, 10, 8, 0.8), (103, 1, 60, 90, 0.5), (101, 0, 25, 30, 0.7)],
        1: [(102, 1, 6, 5, 0.95), (101, 2, 14, 12, 0.6), (103, 0, 35, 45, 0.85)],
        2: [(101, 0, 8, 6, 0.4), (102, 0, 150, 300, 0.9)],
    }
    for im_id, ests in est_layout.items():
        for inf_id, gt_idx, rerr, terr, score in ests:
            r_gt, t_gt = gt_poses[(im_id, gt_idx)]
            r = _rot("z", rerr) @ r_gt
            t = t_gt + rng.normal(size=3) * terr
            # Scale lifting the unit mesh to roughly the GT object's size.
            obj_id = gt_layout[im_id][gt_idx][0]
            scale_mm = models_info[obj_id]["diameter"] / _diameter(inf_verts[inf_id])
            scale_mm *= rng.uniform(0.85, 1.15)
            rows.append(
                f"1,{im_id},{inf_id},{score},"
                + " ".join(f"{x:.9f}" for x in r.reshape(-1))
                + ","
                + " ".join(f"{x:.6f}" for x in t)
                + ",10 20 80 60,"
                + f"{scale_mm / 1000.0:.9f},1.0"
            )
    results_dir = root / "results"
    results_dir.mkdir()
    csv_path = results_dir / "ours_lm-test.csv"
    csv_path.write_text(
        "scene_id,im_id,obj_id,score,R,t,bbox_visib,scale,time\n" + "\n".join(rows) + "\n"
    )

    # Stubs for the toolkit's unused heavy deps.
    stubs = root / "stubs"
    stubs.mkdir()
    (stubs / "trimesh.py").write_text(_TRIMESH_STUB)
    (stubs / "pytz.py").write_text(_PYTZ_STUB)
    (stubs / "png.py").write_text(_PNG_STUB)

    return {
        "root": root,
        "ds_root": ds,
        "datasets_path": ds.parent,
        "models": models,
        "inf_dir": inf_dir,
        "csv": csv_path,
        "results_dir": results_dir,
        "stubs": stubs,
        "targets": ds / "test_targets_bop19.json",
    }


def _toolkit_env(world) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REF}:{world['stubs']}"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


THS = {"chamfer": np.arange(0.05, 0.51, 0.05), "chamfer_proj": np.arange(5, 51, 5)}


@pytest.fixture(scope="module")
def reference_ars(world):
    """Run the vendored toolkit exactly as eval_bop19_pose.py drives it."""
    eval_path = world["root"] / "eval"
    eval_path.mkdir()
    env = _toolkit_env(world)
    ars = {}
    for err_type in ("chamfer", "chamfer_proj"):
        cmd = [
            sys.executable, str(REF / "scripts" / "eval_calc_errors.py"),
            "--n_top=-1", f"--error_type={err_type}",
            "--result_filenames=ours_lm-test.csv",
            f"--results_path={world['results_dir']}",
            f"--eval_path={eval_path}",
            f"--models_inference_path={world['inf_dir']}",
            f"--datasets_path={world['datasets_path']}",
            "--targets_filename=test_targets_bop19.json",
            "--skip_missing=1",
        ]
        r = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-3000:] + r.stdout[-2000:]
        error_sign = f"error={err_type}_ntop=-1"
        recalls = []
        for th in THS[err_type]:
            cmd = [
                sys.executable, str(REF / "scripts" / "eval_calc_scores.py"),
                f"--error_dir_paths=ours_lm-test/{error_sign}",
                f"--eval_path={eval_path}",
                f"--datasets_path={world['datasets_path']}",
                "--targets_filename=test_targets_bop19.json",
                "--visib_gt_min=-1",
                f"--correct_th_{err_type}={th}",
            ]
            r = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=300)
            assert r.returncode == 0, r.stderr[-3000:] + r.stdout[-2000:]
            sign = f"th={th:.3f}_min-visib=-1.000"
            scores = json.loads(
                (eval_path / "ours_lm-test" / error_sign / f"scores_{sign}.json").read_text()
            )
            recalls.append(scores["recall"])
        ars[err_type] = (float(np.mean(recalls)), recalls)
    return ars


@pytest.fixture(scope="module")
def our_scores(world):
    out = world["root"] / "ours.json"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cmd = [
        sys.executable, "-m", "scripts.eval_bop_pose",
        "--results", str(world["csv"]),
        "--dataset", str(world["ds_root"]), "--split", "test",
        "--models-dir", str(world["models"]),
        "--inference-mesh-dir", str(world["inf_dir"]),
        "--errors", "chamfer", "chamfer_proj",
        "--points", "vertices",
        "--targets", str(world["targets"]),
        "--models-info", str(world["models"] / "models_info.json"),
        "--out", str(out),
    ]
    r = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:] + r.stdout[-2000:]
    return json.loads(out.read_text())


def test_ar_parity(reference_ars, our_scores):
    """Per-error AR and overall AR agree with the reference toolkit."""
    ref_ar_ch, _ = reference_ars["chamfer"]
    ref_ar_cp, _ = reference_ars["chamfer_proj"]
    assert abs(our_scores["AR_chamfer"] - ref_ar_ch) < 1e-6, (our_scores, reference_ars)
    assert abs(our_scores["AR_chamfer_proj"] - ref_ar_cp) < 1e-6, (our_scores, reference_ars)
    ref_overall = float(np.mean([ref_ar_ch, ref_ar_cp]))
    assert abs(our_scores["AR"] - ref_overall) < 1e-6


def test_ar_is_informative(reference_ars):
    """The synthetic scene exercises the sweep: AR strictly inside (0, 1)."""
    for err_type, (ar, recalls) in reference_ars.items():
        assert 0.0 < ar < 1.0, (err_type, ar, recalls)
        assert len(set(np.round(recalls, 6))) > 1, (err_type, recalls)
