"""Per-stage device-rate breakdown of the SAM2 video step.

Times each sub-program of the per-frame propagate loop separately
(enqueue N, block once): prepare+embed (Hiera trunk), track_step (memory
attention + SAM heads + memory encoder), postprocess (upsample + pack).
Guides kernel work on the e2e ≥10 FPS target.

  python -m scripts.bench_sam2_stages [--tiny] [--f32] [--no-flash]
"""
from __future__ import annotations

import argparse
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

    from freepose_tpu.models.sam2.predictor import Sam2VideoPredictor, postprocess_video_masks
    from freepose_tpu.models.sam2.video import init_object_state
    from scripts.bench_sam2 import random_params_like

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.tiny:
        from tests.test_sam2_video import OUR_CFG as cfg

        hw = (96, 128)
    else:
        from scripts.common import production_sam2_video_config

        cfg = production_sam2_video_config()
        hw = (720, 1280)

    from freepose_tpu.models.sam2.video import Sam2VideoModel

    model = Sam2VideoModel(cfg)
    state0 = init_object_state(cfg)
    p_cap = cfg.max_point_prompts

    def full(mdl, pixels):
        pyramid, pos = mdl.embed_frame(pixels)
        st, _ = mdl.track_step(
            state0, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(3),
            points=jnp.zeros((1, 1, p_cap, 2)),
            labels=jnp.full((1, 1, p_cap), -10, jnp.int32), is_init=True,
        )
        return mdl.track_step(st, pyramid, pyramid[2], pos[2], jnp.int32(1), jnp.int32(3))

    def init_fn():
        pixels = jnp.zeros((1, 3, cfg.image_size, cfg.image_size), jnp.float32)
        return model.init(jax.random.PRNGKey(0), pixels, method=full)["params"]

    params = random_params_like(init_fn)
    pred = Sam2VideoPredictor(cfg, params, max_objects=1)
    rng = np.random.default_rng(0)
    frame = jax.device_put(rng.integers(0, 255, size=(*hw, 3), dtype=np.uint8))

    # Build a live tracking state via one init step.
    pyramid, pos = pred._prepare_embed_fn(pred.params, frame)
    pts = jnp.zeros((1, 1, 1, p_cap, 2))
    lbl = jnp.full((1, 1, 1, p_cap), -10, jnp.int32).at[..., :2].set(jnp.asarray([2, 3]))
    pts = pts.at[0, 0, 0, 0].set(jnp.asarray([200.0, 150.0])).at[0, 0, 0, 1].set(jnp.asarray([600.0, 500.0]))
    states, out = pred._init_step(
        pred.params, jax.tree.map(lambda *x: jnp.stack(x), *[init_object_state(cfg)]),
        pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(100), pts, lbl,
    )

    def fetch(tree):
        # block_until_ready can return early through the remote-TPU tunnel;
        # a host copy of one element is the only honest sync.
        leaf = jax.tree.leaves(tree)[0]
        return np.asarray(leaf.reshape(-1)[:1])

    def rate(label, fn, result_of):
        fn()  # warm/compile
        fetch(result_of())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(args.iters)]
        fetch(outs[-1])
        dt = 1e3 * (time.perf_counter() - t0) / args.iters
        print(f"{label:<28}: {dt:7.2f} ms/frame (device-rate x{args.iters})")
        return dt

    embed = lambda: pred._prepare_embed_fn(pred.params, frame)
    pyr, pos_ = embed()

    def track():
        st, out = pred._track_step(
            pred.params, states, pyr, pyr[2], pos_[2], jnp.int32(1), jnp.int32(100)
        )
        return out["pred_masks"]

    low = jnp.zeros((1, cfg.image_size // 4, cfg.image_size // 4))
    high = jnp.zeros((1, cfg.image_size, cfg.image_size))
    post = lambda: postprocess_video_masks(low, high, hw, False, True, packbits=True)

    t_e = rate("prepare+embed (trunk+neck)", embed, lambda: embed()[0][2])
    t_t = rate("track_step (mem+heads+enc)", track, track)
    t_p = rate("postprocess (up+pack)", post, lambda: post()[1])
    print(f"{'sum':<28}: {t_e + t_t + t_p:7.2f} ms/frame")


if __name__ == "__main__":
    main()
