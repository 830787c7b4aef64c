import time

import numpy as np

from freepose_tpu.io.npy_bank import FineFeatureBank, consolidate_fine_features


def test_consolidate_and_gather(tmp_path):
    rng = np.random.default_rng(0)
    names = [f"mesh_{i}" for i in range(5)]
    feats_dir = tmp_path / "feats"
    feats_dir.mkdir()
    raw = {}
    for n in names[:4]:  # one missing
        f = rng.normal(size=(6, 16)).astype(np.float32)
        np.save(feats_dir / f"{n.replace('_','')}.npy", f)
        raw[n] = f / np.linalg.norm(f, axis=-1, keepdims=True)
    consolidate_fine_features(feats_dir, names, tmp_path / "fine")
    bank = FineFeatureBank(tmp_path / "fine")
    assert bank.shape == (5, 6, 16)
    block = bank.gather(np.array([0, 2, 4]))
    np.testing.assert_allclose(block[0], raw["mesh_0"], atol=2e-3)
    np.testing.assert_allclose(block[1], raw["mesh_2"], atol=2e-3)
    np.testing.assert_allclose(block[2], 0.0)  # missing mesh -> zeros
    assert bank.meta["missing"] == 1


def test_prefetch_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    names = [f"m{i}" for i in range(3)]
    feats_dir = tmp_path / "feats"
    feats_dir.mkdir()
    for n in names:
        np.save(feats_dir / f"{n}.npy", rng.normal(size=(4, 8)).astype(np.float32))
    consolidate_fine_features(feats_dir, names, tmp_path / "fine")
    bank = FineFeatureBank(tmp_path / "fine")
    idx = np.array([1, 2])
    bank.prefetch(idx)
    time.sleep(0.2)
    a = bank.gather(idx)
    b = np.asarray(bank.mm[idx], np.float32)
    np.testing.assert_allclose(a, b)
