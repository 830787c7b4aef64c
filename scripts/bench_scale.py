"""Benchmark (and TPU compile-check) the scale-estimation stack: CLIP
ViT-bigG-14 image+text encoding and ZoeDepth (BEiT-L + metric-bins head) —
the reference's compute_scale / compute_scale_video models
(scale_estimators.py:50-102, compute_scale_video.py:40,82-84). Runs once per
video in production; this bench exists mainly to validate these two model
families compile and run on real TPU hardware at production shapes.

  python -m scripts.bench_scale            # production shapes
  python -m scripts.bench_scale --tiny     # smoke config
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from freepose_tpu.models.clip import CLIP_TEST, VIT_BIGG_14, ClipFeatureExtractor
    from freepose_tpu.models.zoedepth import DEPTH_TEST, DepthConfig, MetricDepthEstimator
    from scripts.bench_sam2 import random_params_like

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--texts", type=int, default=64,
                    help="text batch (the 2,201-prior encode is a one-time cache)")
    ap.add_argument("--flash", action="store_true",
                    help="Pallas biased flash attention in the ZoeDepth BEiT trunk")
    args = ap.parse_args()

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    rng = np.random.default_rng(0)
    if args.tiny:
        c_cfg, z_cfg = CLIP_TEST, DEPTH_TEST
    else:
        dt = jnp.bfloat16 if on_tpu else jnp.float32
        c_cfg = dataclasses.replace(VIT_BIGG_14, dtype=dt)
        z_cfg = DepthConfig()  # production dtype (compute_scale_video loads f32)
        if args.flash:
            z_cfg = dataclasses.replace(
                z_cfg, beit=dataclasses.replace(z_cfg.beit, use_flash=True)
            )
    print(f"platform: {jax.devices()[0].platform}; clip {c_cfg.vision_layers}L/{c_cfg.vision_width}w @{c_cfg.image_size}, texts {args.texts}")

    # CLIP (random weights via eval_shape)
    from freepose_tpu.models.clip import Clip

    c_model = Clip(c_cfg)
    c_params = random_params_like(lambda: c_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, c_cfg.image_size, c_cfg.image_size)),
        jnp.zeros((1, c_cfg.context_length), jnp.int32),
    ))["params"]
    clip = ClipFeatureExtractor(c_cfg, c_params)

    img = jnp.asarray(rng.random((2, 3, c_cfg.image_size, c_cfg.image_size)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, c_cfg.vocab_size, (args.texts, c_cfg.context_length)), jnp.int32)

    def timed(label, fn):
        out = fn()
        jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
            jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
        print(f"{label}: {(time.perf_counter() - t0) / args.iters * 1e3:7.1f} ms")

    timed("clip image x2  ", lambda: clip.encode_image(img))
    timed(f"clip text x{args.texts:3d}", lambda: clip.encode_text(ids))

    # ZoeDepth
    z = MetricDepthEstimator(z_cfg) if args.tiny else None
    if z is None:
        zm = MetricDepthEstimator.__new__(MetricDepthEstimator)
        from freepose_tpu.models.zoedepth import ZoeDepthModel

        zm.config = z_cfg
        zm.model = ZoeDepthModel(z_cfg)
        zm.params = random_params_like(lambda: zm.model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, z_cfg.image_size, z_cfg.image_size))))["params"]

        @jax.jit
        def _fwd(params, im):
            return zm.model.apply({"params": params}, im)

        zm._fwd = _fwd
        z = zm
    frame = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
    timed("zoedepth 480p  ", lambda: z.predict(frame))


if __name__ == "__main__":
    main()
