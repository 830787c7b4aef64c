import json

import numpy as np
import pytest
from PIL import Image

from freepose_tpu.datasets.bop import BOPDataset
from freepose_tpu.datasets.template import Prefetcher, WebTemplateDataset, write_shard


def _make_bop_scene(root, scene_id=48, n_frames=2, hw=(48, 64)):
    scene = root / "test" / f"{scene_id:06d}"
    (scene / "rgb").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "mask_visib").mkdir()
    cam, gt = {}, {}
    rng = np.random.default_rng(0)
    for f in range(n_frames):
        img = (rng.random((*hw, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(scene / "rgb" / f"{f:06d}.png")
        depth = (rng.random(hw) * 10000).astype(np.uint16)
        Image.fromarray(depth).save(scene / "depth" / f"{f:06d}.png")
        m = np.zeros(hw, np.uint8)
        m[10:30, 20:50] = 255
        Image.fromarray(m).save(scene / "mask_visib" / f"{f:06d}_000000.png")
        cam[str(f)] = {"cam_K": [500.0, 0, 32, 0, 500, 24, 0, 0, 1], "depth_scale": 0.1}
        gt[str(f)] = [{"obj_id": 3, "cam_R_m2c": list(np.eye(3).reshape(-1)), "cam_t_m2c": [0, 0, 500]}]
    (scene / "scene_camera.json").write_text(json.dumps(cam))
    (scene / "scene_gt.json").write_text(json.dumps(gt))
    return root


def test_bop_dataset(tmp_path):
    _make_bop_scene(tmp_path)
    ds = BOPDataset(tmp_path, "test")
    assert len(ds) == 2
    entry = ds[0]
    assert entry["image"].shape == (48, 64, 3)
    assert entry["depth"].shape == (48, 64)
    assert entry["masks"].shape == (1, 48, 64)
    np.testing.assert_array_equal(entry["boxes"][0], [20, 10, 50, 30])
    assert entry["intrinsic"][0, 0] == 500
    assert entry["scene_id"] == 48 and entry["obj_ids" if False else "gt"][0]["obj_id"] == 3
    # Metadata cache written and reused.
    assert (tmp_path / "test_metadata.json").exists()
    ds2 = BOPDataset(tmp_path, "test")
    assert len(ds2) == 2


def test_template_shard_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    v, h = 4, 32
    meshes = {}
    names = []
    for i in range(3):
        name = f"mesh_{i:03d}"
        names.append(name)
        rgb = rng.random((v, h, h, 3)).astype(np.float32)
        depth = rng.random((v, h, h)).astype(np.float32) * 2
        depth[:, :4] = 0
        meshes[name] = (rgb, depth)
    write_shard(tmp_path / "shard-000000.tar", meshes)
    ds = WebTemplateDataset(tmp_path, names, views=v)
    assert len(ds) == 3
    item = ds.get_template_by_name("mesh_001")
    assert item["rgb"].shape == (v, h, h, 3)
    np.testing.assert_allclose(item["rgb"], meshes["mesh_001"][0], atol=2.0 / 255)
    np.testing.assert_allclose(item["depth"], meshes["mesh_001"][1], atol=1e-3)
    assert item["masks"].dtype == bool and not item["masks"][:, :4].any()
    # member index memo written
    assert (tmp_path / "shard-000000.index.npy").exists()
    item2 = ds[1]
    np.testing.assert_allclose(item2["rgb"], item["rgb"])


def test_template_degenerate_mask_fallback(tmp_path):
    """Views with <100 mask pixels fall back to a central half-size square
    (reference src/dataloader/template.py:75-77: 105:315 at 420²)."""
    rng = np.random.default_rng(2)
    v, h = 3, 40
    rgb = rng.random((v, h, h, 3)).astype(np.float32)
    depth = np.zeros((v, h, h), np.float32)
    depth[0, 5:25, 5:25] = 1.0  # 400 px: healthy
    depth[1, 7:10, 7:10] = 1.0  # 9 px: degenerate
    # view 2 fully empty: degenerate
    write_shard(tmp_path / "shard-000000.tar", {"meshx": (rgb, depth)})
    item = WebTemplateDataset(tmp_path, ["meshx"], views=v)[0]
    m = item["masks"]
    assert m[0].sum() == 400 and not m[0, 0, 0]
    for k in (1, 2):
        inner = np.zeros((h, h), bool)
        inner[h // 4 : 3 * h // 4, h // 4 : 3 * h // 4] = True
        assert (m[k] & inner).sum() == inner.sum()
    assert m[1, 8, 8]  # original pixels kept too


def test_prefetcher_order_and_error(tmp_path):
    class DS:
        def __getitem__(self, i):
            if i == 99:
                raise ValueError("boom")
            return i * 2

    assert list(Prefetcher(DS(), [0, 1, 2])) == [0, 2, 4]
    with pytest.raises(ValueError):
        list(Prefetcher(DS(), [0, 99]))


def test_bop_dataset_params(tmp_path):
    from freepose_tpu.datasets.bop_params import get_dataset_params

    p = get_dataset_params(tmp_path, "ycbv")
    assert p.obj_ids == list(range(1, 22))
    assert p.test_scene_ids == list(range(48, 60))
    assert p.im_size == (640, 480)
    assert 13 in p.symmetric_obj_ids
    assert p.models_info_path == tmp_path / "ycbv/models/models_info.json"
    # tless defaults to CAD models (reference dataset_params.py:113-114).
    t = get_dataset_params(tmp_path, "tless")
    assert t.models_path.name == "models_cad"
    import pytest as _pytest

    with _pytest.raises(KeyError):
        get_dataset_params(tmp_path, "nope")


def test_bop_path_env_resolution(tmp_path, monkeypatch):
    """Bare dataset names resolve under $BOP_PATH (reference
    bop_toolkit_lib/config.py:12-15)."""
    import numpy as np
    from PIL import Image

    from freepose_tpu.datasets.bop import BOPDataset

    scene = tmp_path / "minibop" / "test" / "000001"
    (scene / "rgb").mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(scene / "rgb" / "000000.png")
    (scene / "scene_camera.json").write_text(
        '{"0": {"cam_K": [10.0, 0, 4, 0, 10, 4, 0, 0, 1], "depth_scale": 0.1}}'
    )
    (scene / "scene_gt.json").write_text("{}")
    monkeypatch.setenv("BOP_PATH", str(tmp_path))
    import os

    cwd = os.getcwd()
    os.chdir("/")  # ensure the bare name can't resolve relative to cwd
    try:
        ds = BOPDataset("minibop", "test")
    finally:
        os.chdir(cwd)
    assert len(ds) == 1
