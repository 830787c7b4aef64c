"""Multi-object VOS inference tool (scripts/vos_inference.py) vs the
reference tool's behavior (segment-anything-2/tools/vos_inference.py):
palette-PNG dataset trees, per-object first-appearance seeding, per-object
output trees, and J&F reporting — on a synthetic 2-object video."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image

from scripts.vos_inference import (
    davis_palette,
    get_per_obj_mask,
    load_ann_png,
    put_per_obj_mask,
    save_ann_png,
)

REPO = Path(__file__).resolve().parent.parent
slow = pytest.mark.slow


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["FREEPOSE_TINY_MODELS"] = "1"
    env["PYTHONPATH"] = str(REPO)
    return env


def _make_tree(tmp_path, n_frames=6, size=64):
    """Synthetic video: object 1 (square, present from frame 0) and object 2
    (square, disjoint, masked from frame 2)."""
    base = tmp_path / "videos" / "vid1"
    base.mkdir(parents=True)
    masks = tmp_path / "masks" / "vid1"
    masks.mkdir(parents=True)
    rng = np.random.default_rng(0)
    m1 = np.zeros((size, size), bool)
    m1[8:24, 8:24] = True
    m2 = np.zeros((size, size), bool)
    m2[40:56, 36:60] = True
    for t in range(n_frames):
        img = (rng.random((size, size, 3)) * 60).astype(np.uint8)
        img[m1] = (250, 40, 40)
        img[m2] = (40, 250, 40)
        Image.fromarray(img).save(base / f"{t:05d}.jpg", quality=95)
    pal = davis_palette()
    ann0 = np.zeros((size, size), np.uint8)
    ann0[m1] = 1
    save_ann_png(masks / "00000.png", ann0, pal)
    ann2 = np.zeros((size, size), np.uint8)
    ann2[m2] = 2
    save_ann_png(masks / "00002.png", ann2, pal)
    # GT tree for J&F: both objects static.
    gt = tmp_path / "gt" / "vid1"
    gt.mkdir(parents=True)
    for t in range(n_frames):
        ann = np.zeros((size, size), np.uint8)
        ann[m1] = 1
        if t >= 2:
            ann[m2] = 2
        save_ann_png(gt / f"{t:05d}.png", ann, pal)
    return m1, m2


def test_palette_roundtrip(tmp_path):
    pal = davis_palette()
    mask = np.zeros((16, 16), np.uint8)
    mask[2:6, 3:9] = 1
    mask[4:8, 10:14] = 2  # overlapping ids resolved by put_per_obj (low wins)
    save_ann_png(tmp_path / "m.png", mask, pal)
    back, pal2 = load_ann_png(tmp_path / "m.png")
    assert np.array_equal(back, mask)
    per = get_per_obj_mask(back)
    assert set(per) == {1, 2}
    merged = put_per_obj_mask(per, 16, 16)
    assert np.array_equal(merged, mask)
    # Overlap: lower id wins (reference paints descending ids).
    both = {1: np.ones((4, 4), bool), 2: np.ones((4, 4), bool)}
    assert (put_per_obj_mask(both, 4, 4) == 1).all()


def _iou(a, b):
    return np.logical_and(a, b).sum() / max(np.logical_or(a, b).sum(), 1)


@slow
def test_multi_object_tree(tmp_path):
    m1, m2 = _make_tree(tmp_path)
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "scripts.vos_inference",
         "--base-video-dir", str(tmp_path / "videos"),
         "--input-mask-dir", str(tmp_path / "masks"),
         "--output-mask-dir", str(out),
         "--gt-mask-dir", str(tmp_path / "gt"),
         "--use-all-masks"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads(r.stdout.strip().splitlines()[-2])
    assert report["video"] == "vid1" and report["frames"] == 6
    assert report["objects"] == [1, 2]
    assert "per_object" in report and set(map(int, report["per_object"])) == {1, 2}

    outs = {int(p.stem): load_ann_png(p)[0] for p in (out / "vid1").glob("*.png")}
    assert sorted(outs) == list(range(6))
    # Mask-as-output at each prompt frame: the output IS the seeded mask.
    assert _iou(outs[0] == 1, m1) > 0.8
    assert _iou(outs[2] == 2, m2) > 0.8
    # Object 2 emits nothing before its first-appearance frame.
    assert (outs[0] != 2).all() and (outs[1] != 2).all()
    # Palette preserved.
    assert load_ann_png(out / "vid1" / "00000.png")[1] is not None


@slow
def test_per_obj_png_mode(tmp_path):
    m1, m2 = _make_tree(tmp_path, n_frames=4)
    # Rewrite input masks as per-object trees {obj:03d}/{frame}.png.
    masks = tmp_path / "masks" / "vid1"
    pal = davis_palette()
    for p in masks.glob("*.png"):
        ann, _ = load_ann_png(p)
        for obj_id, m in get_per_obj_mask(ann).items():
            odir = masks / f"{obj_id:03d}"
            odir.mkdir(exist_ok=True)
            save_ann_png(odir / p.name, m.astype(np.uint8), pal)
        p.unlink()
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "scripts.vos_inference",
         "--base-video-dir", str(tmp_path / "videos"),
         "--input-mask-dir", str(tmp_path / "masks"),
         "--output-mask-dir", str(out),
         "--per-obj-png-file", "--use-all-masks"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    # Per-object output trees, one PNG per frame per object.
    for obj in ("001", "002"):
        files = sorted((out / "vid1" / obj).glob("*.png"))
        assert len(files) == 4, (obj, files)
    ann0, _ = load_ann_png(out / "vid1" / "001" / "00000.jpg".replace(".jpg", ".png"))
    assert _iou(ann0 > 0, m1) > 0.8
