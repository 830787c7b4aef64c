"""Benchmark the static proposal stage: GroundingDINO detection + SAM2 mask
decoding + DINOv2 FFA retrieval over the 46k-mesh bank — the per-frame cost
of scripts/extract_proposals_ground (reference extract_proposals_ground.py's
hot loop, SURVEY.md §3.1). Random weights (timing + TPU compile check only).

  python -m scripts.bench_proposals            # production shapes
  python -m scripts.bench_proposals --tiny     # smoke config (CPU-friendly)
"""
from __future__ import annotations

import argparse
import os
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def main() -> None:
    run_proposals_bench(_parse())


def _parse():
    import argparse as _ap

    ap = _ap.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--boxes", type=int, default=4, help="detections per frame")
    ap.add_argument("--bank-rows", type=int, default=46037)
    return ap.parse_args()


def make_args(**kw):
    import types

    d = dict(tiny=False, frames=8, boxes=4, bank_rows=46037)
    d.update(kw)
    return types.SimpleNamespace(**d)


def run_proposals_bench(args) -> dict:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from freepose_tpu.models.grounding_dino import GDINO_TEST, GroundingDinoConfig, GroundingDino, GroundingDinoDetector
    from freepose_tpu.models.sam2.model import SAM2_TEST, Sam2Config, Sam2ImageModel
    from freepose_tpu.models.sam2.predictor import Sam2ImagePredictor
    from freepose_tpu.models.dinov2 import VIT_L14_REG, DinoFeatureExtractor, DinoV2Config
    from freepose_tpu.ops.knn import topk_search
    from freepose_tpu.ops.sampling import ffa_pool
    from freepose_tpu.pipeline.proposals import extract_proposals
    from freepose_tpu.pipeline.template_bank import normalize_feats
    from scripts.bench_sam2 import random_params_like

    rng = np.random.default_rng(0)
    if args.tiny:
        g_cfg, g_size = GDINO_TEST, 64
        s_cfg, s_size = SAM2_TEST, 64
        d_cfg, d_res, layer = (
            DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56),
            84, 2,
        )
        h, w, bank_rows = 120, 160, 512
    else:
        import dataclasses

        # bf16 everywhere — the production CLI configs.
        from scripts.common import production_gdino_config, production_sam2_config

        g_cfg, g_size = production_gdino_config(), 800
        s_cfg, s_size = production_sam2_config()
        d_cfg = dataclasses.replace(VIT_L14_REG, dtype=jnp.bfloat16, use_flash=True)
        d_res, layer = 420, 22
        h, w, bank_rows = 480, 640, args.bank_rows
    print(f"platform: {jax.devices()[0].platform}; frame {h}x{w}, {args.boxes} boxes, bank {bank_rows}")

    # --- models with random weights (eval_shape init: no host forward) ---- #
    g_model = GroundingDino(g_cfg)
    tok_len = 6
    g_params = random_params_like(lambda: g_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 3, g_size, g_size)),
        jnp.zeros((1, tok_len), jnp.int32),
        jnp.ones((1, tok_len), jnp.int32),
        jnp.zeros((1, tok_len), jnp.int32),
        jnp.ones((1, tok_len), bool),
    ))["params"]
    detector = GroundingDinoDetector(g_cfg, g_params, image_size=g_size)

    s_model = Sam2ImageModel(s_cfg)
    s_params = random_params_like(lambda: s_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, s_size, s_size))))["params"]
    predictor = Sam2ImagePredictor(s_cfg, s_params, image_size=s_size)

    fe = DinoFeatureExtractor(d_cfg)
    bank = rng.standard_normal((bank_rows, d_cfg.hidden_size)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    bank = jnp.asarray(bank)

    frames = (rng.random((args.frames, h, w, 3)) * 255).astype(np.uint8)
    ids = np.asarray([[101, 5200, 2015, 1012, 102, 0]], np.int64)  # "objects ."-ish
    grid = d_res // d_cfg.patch_size

    def stage_times(frame):
        t = {}
        t0 = time.perf_counter()
        boxes, _ = detector.detect(frame, input_ids=ids, box_threshold=0.5)
        boxes = np.asarray(boxes[: args.boxes], np.float32)
        if len(boxes) < args.boxes:  # random weights may detect fewer
            fill = np.tile(np.asarray([[10.0, 10, 100, 100]], np.float32),
                           (args.boxes - len(boxes), 1))
            boxes = np.concatenate([boxes.reshape(-1, 4), fill])
        t["detect"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        predictor.set_image(jnp.asarray(frame))
        masks, _, _ = predictor.predict(box=np.asarray(boxes), multimask_output=False)
        masks = masks[:, 0]
        t["sam2"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        from freepose_tpu.pipeline.proposals import retrieve_topk

        scores_k, idx_k, _ = retrieve_topk(
            jnp.asarray(frame), jnp.asarray(masks),
            jnp.asarray(np.asarray(boxes, np.float32)), bank, fe,
            layer=layer, feature_type="ffa",
            k=min(100, bank.shape[0]), target_size=d_res, bbox_extend=0.2,
        )
        np.asarray(idx_k)
        t["retrieval"] = time.perf_counter() - t0
        return t

    def enqueue_device(frame):
        """Whole proposal stage ON DEVICE, one fetch handle per frame:
        detect_topk_device boxes feed predict_device mask decoding feed the
        fused retrieval — the per-frame host traffic is the final top-k
        indices (the reference round-trips boxes and masks through the host
        between its three torch stages, extract_proposals_ground.py:48-140).
        Frames pipeline 1-deep: frame i+1's whole chain enqueues before
        frame i's indices are fetched."""
        from freepose_tpu.pipeline.proposals import retrieve_topk

        fd = jnp.asarray(frame)
        boxes_dev, _ = detector.detect_topk_device(fd, k=args.boxes, input_ids=ids)
        predictor.set_image(fd)
        masks_dev, _ = predictor.predict_device(box=boxes_dev, multimask_output=False)
        _, idx_k, _ = retrieve_topk(
            fd, masks_dev[:, 0], boxes_dev, bank, fe,
            layer=layer, feature_type="ffa",
            k=min(100, bank.shape[0]), target_size=d_res, bbox_extend=0.2,
        )
        try:
            idx_k.copy_to_host_async()
        except Exception:
            pass
        return idx_k

    # warm-up compiles
    stage_times(frames[0])
    np.asarray(enqueue_device(frames[0]))
    agg: dict[str, list[float]] = {}
    for f in frames[1:]:
        for k, v in stage_times(f).items():
            agg.setdefault(k, []).append(v)
    out = {}
    total = 0.0
    for k, v in agg.items():
        ms = 1e3 * float(np.median(v))
        out[k + "_ms"] = ms
        total += ms
        print(f"{k:9s}: {ms:7.1f} ms/frame  (host-path isolated)")
    print(f"host path: {total:7.1f} ms/frame = {1e3 / total:.2f} frames/s")
    out["host_total_ms"] = total

    # Device-pipelined path (the headline): 1-deep fetch lag.
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        prev = None
        for f in frames:
            h_i = enqueue_device(f)
            if prev is not None:
                np.asarray(prev)
            prev = h_i
        np.asarray(prev)
        reps.append(1e3 * (time.perf_counter() - t0) / len(frames))
    dev_ms = float(np.median(reps))
    print(f"device-pipelined: {dev_ms:7.1f} ms/frame = {1e3 / dev_ms:.2f} frames/s "
          f"(reps {['%.0f' % r for r in reps]})")
    out["total_ms"] = dev_ms
    out["device_rep_ms"] = reps
    return out


if __name__ == "__main__":
    main()
