"""Benchmark SAM2 video mask propagation (the proposal-stage per-frame cost).

The reference runs SAM2 hiera-large per frame to propagate object masks
(segment-anything-2/sam2/sam2_video_predictor.py:644-726); in the full video
pipeline this sits alongside the fine-refine step in the per-frame budget.
Measures: frame embedding (Hiera-L @1024², the dominant cost) + the
memory-attention track step, per frame, with random weights (timing only).

  python -m scripts.bench_sam2            # production config on the ambient platform
  python -m scripts.bench_sam2 --tiny     # smoke-test config
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def random_params_like(model_init, rng_seed: int = 0):
    """Random params from eval_shape (no forward pass — Hiera-L @1024² on a
    single-core CPU host would take minutes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    shapes = jax.eval_shape(model_init)
    rng = np.random.default_rng(rng_seed)

    def leaf(s):
        return jnp.asarray(rng.standard_normal(s.shape).astype(np.float32) * 0.02, s.dtype)

    return jax.tree.map(leaf, shapes)


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from freepose_tpu.models.sam2.model import SAM2_TEST, Sam2Config
    from freepose_tpu.models.sam2.predictor import Sam2VideoPredictor
    from freepose_tpu.models.sam2.video import Sam2VideoConfig, Sam2VideoModel

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--objects", type=int, default=1)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--logits", action="store_true",
                    help="fetch f32 mask logits instead of on-device-thresholded bool")
    ap.add_argument("--flash", action="store_true",
                    help="Pallas flash attention in Hiera global blocks + memory attention")
    ap.add_argument("--device-rate", action="store_true",
                    help="enqueue all frames, block once: device-bound ms/frame "
                         "(per-frame tunnel round trips pipeline away)")
    args = ap.parse_args()

    if args.tiny:
        from tests.test_sam2_video import OUR_CFG  # coordinated tiny config

        cfg = OUR_CFG
        hw = (96, 128)
    else:
        sam = Sam2Config()
        if args.bf16:
            sam = dataclasses.replace(
                sam,
                hiera=dataclasses.replace(sam.hiera, dtype=jnp.bfloat16),
                dtype=jnp.bfloat16,
            )
        if args.flash:
            sam = dataclasses.replace(sam, hiera=dataclasses.replace(sam.hiera, use_flash=True))
        cfg = Sam2VideoConfig(sam=sam)
        if args.flash:
            cfg = dataclasses.replace(cfg, mem=dataclasses.replace(cfg.mem, use_flash=True))
        hw = (720, 1280)

    model = Sam2VideoModel(cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(args.warmup + args.frames, *hw, 3), dtype=np.uint8)

    from freepose_tpu.models.sam2.video import init_object_state

    state0 = init_object_state(cfg)
    p_cap = cfg.max_point_prompts

    def full(mdl, pixels):
        # Exercise init (SAM prompts) + tracking (memory attention) paths so
        # every parameter is created (pattern from tests/test_sam2_predictor).
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
    pred = Sam2VideoPredictor(cfg, params, max_objects=args.objects)

    state = pred.init_state(frames)
    for i in range(args.objects):
        state = pred.add_new_points_or_box(
            state, 0, obj_id=i, box=np.array([200 + 40 * i, 150, 600, 500], np.float32)
        )

    print(f"platform: {jax.devices()[0].platform}; image {cfg.image_size}², "
          f"{args.objects} object(s), dtype {'bf16' if args.bf16 and not args.tiny else 'f32'}")

    if args.device_rate:
        # Warm pass compiles everything; timed pass enqueues every frame and
        # fetches only the last mask (single-array fetch: the only honest
        # block through the remote-TPU tunnel), so per-frame round trips
        # pipeline away and the figure is device-bound.
        for _ in pred.propagate_in_video(state, binarize=not args.logits):
            pass
        t0 = time.perf_counter()
        last = None
        n = 0
        for frame_idx, obj_ids, low, high in pred.propagate_in_video(
            state, binarize=not args.logits
        ):
            last = high
            n += 1
        np.asarray(last)
        ms = 1e3 * (time.perf_counter() - t0) / n
        print(f"propagate (device-rate): {ms:.1f} ms/frame = {1e3 / ms:.2f} FPS over {n} frames")
        return

    times = []
    t_prev = time.perf_counter()
    n = 0
    for frame_idx, obj_ids, low, high in pred.propagate_in_video(
        state, binarize=not args.logits
    ):
        jax.block_until_ready(high)
        t_now = time.perf_counter()
        if n >= args.warmup:
            times.append(t_now - t_prev)
        t_prev = t_now
        n += 1
    ms = 1e3 * float(np.mean(times))
    print(f"propagate: {ms:.1f} ms/frame = {1e3 / ms:.2f} FPS "
          f"(median {1e3 * float(np.median(times)):.1f} ms over {len(times)} frames)")


if __name__ == "__main__":
    main()
