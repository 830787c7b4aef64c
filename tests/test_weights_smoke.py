"""Released-weights drop-in smoke (`pytest -m weights`; VERDICT r4 #5).

Gated on converted params under $FREEPOSE_PARAMS_DIR (default data/params/),
produced by `make weights` / scripts/prepare_weights.py from the released
checkpoints (egress-blocked in the build environment — each test SKIPS when
its file is absent, so the suite is a no-op until the weights drop).

What each test asserts: the converted .npz loads and traces through the
PRODUCTION-config forward via jax.eval_shape — Flax raises on any missing /
extra / mis-shaped parameter, so this validates the real checkpoint's
conversion against the full production model layout in seconds, no TPU
needed. Cheap families additionally run a real forward (finite outputs).
Conversion NUMERICS are covered by the HF-parity converter fixtures
(tests/test_convert_fixtures.py); the full accuracy gate is the
docs/WEIGHTS.md eval runbook (BASELINE.md AR within 1%).

The harness itself is validated offline by test_smoke_harness_selftest
(random-init ViT-B params through the same save->load->smoke path).
"""
import dataclasses
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.weights

PARAMS_DIR = Path(os.environ.get("FREEPOSE_PARAMS_DIR", "data/params"))


def _load(name: str):
    path = PARAMS_DIR / name
    if not path.exists():
        pytest.skip(f"{path} absent — run `make weights` with checkpoints in place")
    from scripts.common import load_params

    return load_params(path)


def _smoke_dinov2(params, cfg, layer, img=140, forward=False):
    from freepose_tpu.models.dinov2 import DinoFeatureExtractor

    fe = DinoFeatureExtractor(cfg, params=params)
    x = jnp.zeros((1, 3, img, img), cfg.dtype)
    out = jax.eval_shape(lambda p, im: fe.model.apply({"params": p}, im, layer=layer),
                         fe.params, x)
    n_tok = (img // cfg.patch_size) ** 2 + 1 + cfg.num_registers
    assert out.shape == (1, n_tok, cfg.hidden_size)
    if forward:
        rng = np.random.default_rng(0)
        feats = fe(jnp.asarray(rng.random((1, 3, img, img)), cfg.dtype), layer=layer)
        assert np.isfinite(np.asarray(feats, np.float32)).all()


def test_dinov2_vitl():
    from freepose_tpu.models.dinov2 import VIT_L14_REG

    _smoke_dinov2(_load("dinov2_vitl.npz"), VIT_L14_REG, layer=22, forward=True)


def test_dinov2_vitb():
    from freepose_tpu.models.dinov2 import VIT_B14_REG

    _smoke_dinov2(_load("dinov2_vitb.npz"), VIT_B14_REG, layer=None, forward=True)


def test_clip_bigg():
    from freepose_tpu.models.clip import VIT_BIGG_14, Clip

    params = _load("clip_bigg.npz")
    model = Clip(VIT_BIGG_14)
    img, txt = jax.eval_shape(
        lambda p, im, ids: model.apply({"params": p}, im, ids),
        params,
        jax.ShapeDtypeStruct((1, 3, 224, 224), jnp.float32),
        jax.ShapeDtypeStruct((2, 77), jnp.int32),
    )
    assert img.shape == (1, VIT_BIGG_14.embed_dim)
    assert txt.shape == (2, VIT_BIGG_14.embed_dim)
    # Real text-tower forward (cheap): finite embeddings from real weights.
    ids = np.zeros((2, 77), np.int64)
    ids[:, 0], ids[:, 1], ids[:, 2] = 49406, 320, 49407
    emb = model.apply({"params": params}, None, jnp.asarray(ids),
                      method=lambda m, _im, t: m.encode_text(t))
    assert np.isfinite(np.asarray(emb)).all()


def test_grounding_dino():
    from freepose_tpu.models.grounding_dino import (
        GroundingDino, GroundingDinoConfig, text_token_masks)

    params = _load("grounding_dino.npz")
    cfg = GroundingDinoConfig()  # grounding-dino-base (Swin-B)
    ids = np.array([[101, 5200, 1012, 102]])
    sa, pos = text_token_masks(ids)
    logits, boxes = jax.eval_shape(
        lambda p, px, i, s, po, pm: GroundingDino(cfg).apply(
            {"params": p}, px, i, s, po, pm),
        params,
        jax.ShapeDtypeStruct((1, 3, 224, 224), jnp.float32),
        jnp.asarray(ids), jnp.asarray(sa), jnp.asarray(pos),
        jnp.asarray(ids == 0),
    )
    assert logits.shape == (1, cfg.num_queries, cfg.max_text_len)
    assert boxes.shape == (1, cfg.num_queries, 4)


def test_sam2_hiera_l():
    from freepose_tpu.models.sam2.video import (
        Sam2VideoConfig, Sam2VideoModel, init_object_state)

    params = _load("sam2_hiera_l.npz")
    cfg = Sam2VideoConfig()  # production default IS hiera-L @1024
    model = Sam2VideoModel(cfg)
    state0 = init_object_state(cfg)
    p_cap = cfg.max_point_prompts

    def full(mdl, pixels):
        pyramid, pos = mdl.embed_frame(pixels)
        st, out = mdl.track_step(
            state0, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(3),
            points=jnp.zeros((1, 1, p_cap, 2)),
            labels=jnp.full((1, 1, p_cap), -10, jnp.int32), is_init=True,
        )
        mdl._mask_as_output(pyramid, jnp.zeros((1, cfg.image_size, cfg.image_size)))
        return mdl.track_step(st, pyramid, pyramid[2], pos[2], jnp.int32(1), jnp.int32(3))

    jax.eval_shape(
        lambda p, px: model.apply({"params": p}, px, method=full),
        params,
        jax.ShapeDtypeStruct((1, 3, cfg.image_size, cfg.image_size), jnp.float32),
    )


def test_zoedepth():
    from freepose_tpu.models.zoedepth import DepthConfig, ZoeDepthModel

    params = _load("zoedepth.npz")
    cfg = DepthConfig()
    out = jax.eval_shape(
        lambda p, im: ZoeDepthModel(cfg).apply({"params": p}, im),
        params, jax.ShapeDtypeStruct((1, 3, 384, 512), jnp.float32),
    )
    assert out.shape == (1, 384, 512)


def test_cotracker2():
    from freepose_tpu.models.cotracker2 import COTRACKER2, CoTracker2

    params = _load("cotracker2.npz")
    cfg = COTRACKER2
    h, w = cfg.model_resolution
    tracks, vis = jax.eval_shape(
        lambda p, v, q: CoTracker2(cfg).apply({"params": p}, v, q, cfg.iters),
        params,
        jax.ShapeDtypeStruct((cfg.window_len, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((4, 3), jnp.float32),
    )
    assert tracks.shape[-1] == 2 and tracks.shape[-2] == 4


@pytest.mark.nonweights_selftest
def test_smoke_harness_selftest(tmp_path, monkeypatch):
    """Runs WITHOUT released weights: random-init ViT-B params through the
    same save -> load -> production-smoke path proves the gate harness works
    the day the checkpoints drop."""
    from freepose_tpu.models.dinov2 import VIT_B14_REG, DinoFeatureExtractor
    from scripts.common import save_params

    import sys

    fe = DinoFeatureExtractor(VIT_B14_REG)
    save_params(jax.tree.map(np.asarray, fe.params), tmp_path / "dinov2_vitb.npz")
    monkeypatch.setattr(sys.modules[__name__], "PARAMS_DIR", tmp_path)
    test_dinov2_vitb()
