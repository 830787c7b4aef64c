"""Round benchmark on one TPU chip.

Default metric: HONEST END-TO-END per-frame cost of the video pose pipeline
(reference extract_proposals_ground_video -> dino_inference_video per-frame
loops, interleaved): SAM2 hiera-L mask propagation (chunked — one scanned
program per 8 frames) PLUS the fine pose refine (autonomous device-resident
fine-view cache chain) at reference-parity config — 720p video, 20k-pose
fine grid, 32-view neighbourhood, DINOv2-L/14-reg bf16 features, 16k-face
mesh, 2°/frame object motion. vs_baseline = FPS / 10 (BASELINE.md north
star; that target was set for a v5p-8 — this measures ONE chip).

FREEPOSE_BENCH=refine reports the fine-refine stage alone (the
dino_inference_video per-frame loop when masks are precomputed, the
reference's own stage split); FREEPOSE_BENCH=coarse the static-dataset
coarse hot path (scripts/dino_inference.py) in proposals/s.

Prints ONE JSON line {metric, value, unit, vs_baseline}.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the driver's end-of-round bench run reuses
# executables compiled during the round (remote TPU compiles are slow).
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

TINY = bool(os.environ.get("FREEPOSE_BENCH_TINY"))
BATCH = 2 if TINY else int(os.environ.get("FREEPOSE_BENCH_BATCH", "64"))
N_VIEWS = 32 if TINY else 600
RES = 56 if TINY else 420
TARGET_FPS = 10.0


def main() -> None:
    which = os.environ.get("FREEPOSE_BENCH", "e2e")
    if which == "coarse":
        return main_coarse()
    if which == "refine":
        return main_refine()
    if which == "proposals":
        return main_proposals()
    return main_e2e()


def main_proposals() -> None:
    """Static-dataset proposal stage (extract_proposals_ground hot loop):
    GroundingDINO detect + SAM2 mask decode + FFA retrieval per frame.
    vs_baseline is against the 250 ms/frame stage target (VERDICT r2 #7)."""
    from scripts.bench_proposals import make_args, run_proposals_bench

    res = run_proposals_bench(make_args(tiny=TINY, frames=4 if TINY else 8))
    ms = res["total_ms"]
    print(
        json.dumps(
            {
                "metric": "static proposal stage ms/frame (GroundingDINO@800 "
                "detect + SAM2 masks + FFA retrieval over the 46k bank, bf16)",
                "value": round(ms, 1),
                "unit": "ms/frame",
                "vs_baseline": round(250.0 / ms, 3),
                "stages": {
                    k: (round(v, 1) if isinstance(v, float) else v)
                    for k, v in res.items()
                },
            }
        )
    )


def main_e2e() -> None:
    from scripts.bench_e2e import make_args, run_e2e_bench

    args = make_args(tiny=TINY, frames=8 if TINY else 96, warmup=2 if TINY else 8,
                     reps=2 if TINY else 3)
    retried = False
    try:
        res = run_e2e_bench(args)
    except Exception as e:  # tunneled-TPU sessions occasionally drop a
        # claim mid-run (FAILED_PRECONDITION / backend unavailability on a
        # fetch); one clean retry in a fresh backend context recovers it.
        # Genuine regressions (shape errors, assertions, OOM) re-raise.
        msg = f"{type(e).__name__}: {e}"
        transient = any(
            s in msg
            for s in ("FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE_EXCEEDED",
                      "INTERNAL", "XlaRuntimeError", "claim")
        )
        if not transient:
            raise
        print(f"bench attempt failed ({msg}); retrying once", flush=True)
        time.sleep(30)
        retried = True
        res = run_e2e_bench(args)
    fps = 1e3 / res["e2e_ms"]
    if retried:
        res["stages"]["retried"] = True
    print(
        json.dumps(
            {
                "metric": "end-to-end 4-stage video pipeline FPS per chip "
                "(amortized frame-0 detect+retrieval+scale, SAM2 hiera-L "
                "propagation DEVICE-COUPLED into fine refine, track-refine "
                "smooth pass; 720p, 20k grid, DINOv2-L bf16, 2 deg/frame, "
                "median of 3 loop reps)",
                "value": round(fps, 2),
                "unit": "FPS",
                "vs_baseline": round(fps / TARGET_FPS, 3),
                "stages": res["stages"],
            }
        )
    )


def main_refine() -> None:
    from scripts.bench_refine import make_args, run_refine_bench

    res = run_refine_bench(
        make_args(tiny=TINY, no_uncached=True, frames=8 if TINY else 40,
                  warmup=2 if TINY else 8)
    )
    # Headline: the autonomous device-cache chain (closed-loop streaming —
    # the video pipeline's real per-frame cost); serial cached as fallback.
    ms = res.get("auto_ms_mean") or res.get("chain_ms_mean") or res["cached_ms_mean"]
    fps = 1e3 / ms
    print(
        json.dumps(
            {
                "metric": "video fine-refine FPS per chip (20k grid, "
                "DINOv2-L bf16, autonomous device fine-view cache, "
                "closed-loop chain, 2 deg/frame)",
                "value": round(fps, 2),
                "unit": "FPS",
                "vs_baseline": round(fps / TARGET_FPS, 3),
            }
        )
    )


def main_coarse() -> None:
    from freepose_tpu.models.dinov2 import VIT_L14_REG, DinoV2, normalize_images, split_tokens
    from freepose_tpu.pipeline.pose_estimator import score_and_lift
    from freepose_tpu.pipeline.template_bank import normalize_feats
    from freepose_tpu.geometry.rotation import template_poses

    import dataclasses

    if TINY:
        from freepose_tpu.models.dinov2 import DinoV2Config

        cfg = DinoV2Config(hidden_size=64, num_layers=2, num_heads=4, image_size=56, dtype=jnp.bfloat16)
        layer = 2
    else:
        cfg = dataclasses.replace(VIT_L14_REG, dtype=jnp.bfloat16, use_flash=True)
        layer = 22
    model = DinoV2(cfg)
    rng = np.random.default_rng(0)
    grid = (RES // cfg.patch_size) ** 2

    proposals = jnp.asarray(rng.random((BATCH, 3, RES, RES)), jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(0), proposals[:1, :, : cfg.patch_size * 2, : cfg.patch_size * 2]
    )["params"]
    feats = rng.normal(size=(N_VIEWS, grid, cfg.hidden_size)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    feats = jnp.asarray(feats, jnp.bfloat16)
    pc_mean = jnp.asarray(np.tile([0, 0, 1.1], (N_VIEWS, 1)), jnp.float32)
    pc_min, pc_max = pc_mean - 0.25, pc_mean + 0.25
    poses = template_poses(N_VIEWS)
    k = jnp.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    bboxes = jnp.asarray(rng.random((BATCH, 4)) * 200 + np.array([100, 100, 300, 300]), jnp.float32)

    @jax.jit
    def step(params, proposals, bboxes, feats, pc_min, pc_max, pc_mean, poses):
        tokens = model.apply({"params": params}, normalize_images(proposals), layer=layer)
        qf = normalize_feats(split_tokens(tokens, cfg.num_registers)["patch"])

        def one(q, bbox):
            return score_and_lift(feats, q, pc_min, pc_max, pc_mean, poses, k, bbox, jnp.float32(0.15), 3)

        return jax.vmap(one)(qf, bboxes)

    bank_args = (feats, pc_min, pc_max, pc_mean, poses)
    out = jax.block_until_ready(step(params, proposals, bboxes, *bank_args))
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = jax.block_until_ready(step(params, proposals, bboxes, *bank_args))
    dt = (time.perf_counter() - t0) / n_iter
    fps = BATCH / dt

    print(
        json.dumps(
            {
                "metric": "coarse-pose proposals/s per chip (DINOv2-L@420 + 600-view match + z-lift, bf16)",
                "value": round(fps, 2),
                "unit": "proposals/s",
                "vs_baseline": round(fps / TARGET_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
