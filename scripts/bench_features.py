"""Isolate the DINOv2 feature-extraction cost (the pipeline's dominant term).

Every hot stage (coarse match, fine refine, cache misses, chains) is bounded
by ViT-L patch-feature extraction on 420² crops; this measures its device
throughput at several batch sizes and ablations (flash vs dense attention,
layer truncation) and reports achieved model FLOPs utilisation so kernel
work can be aimed where the headroom is.

  python -m scripts.bench_features             # production ViT-L/14-reg bf16
  python -m scripts.bench_features --tiny      # CPU smoke test
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

    from freepose_tpu.models.dinov2 import VIT_L14_REG, DinoFeatureExtractor, DinoV2Config

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batches", default="1,4,8,16,32")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--layer", type=int, default=22)
    args = ap.parse_args()

    if args.tiny:
        cfg = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56)
        res, layer = 56, 2
    else:
        cfg = dataclasses.replace(VIT_L14_REG, dtype=jnp.bfloat16, use_flash=True)
        res, layer = 420, args.layer

    rng = np.random.default_rng(0)
    grid = res // cfg.patch_size
    tokens = grid * grid + 1 + cfg.num_registers
    d = cfg.hidden_size
    # Per-image forward FLOPs through `layer` blocks: qkv+proj (4 d²) +
    # mlp (8 d²) per token plus attention score/value matmuls (4 t d).
    flops = layer * (tokens * 12 * d * d + 4 * tokens * tokens * d) * 2
    flops += tokens * 3 * d * cfg.patch_size**2 * 2  # patchify conv

    def run(fe, label):
        for b in [int(s) for s in args.batches.split(",")]:
            imgs = jnp.asarray(rng.random((b, 3, res, res), np.float32))
            # NB block_until_ready does not wait through the remote-TPU
            # tunnel; fetch a scalar instead. Device execution is FIFO, so
            # fetching the LAST iteration's output drains the whole pipeline
            # (one ~32 ms tunnel round trip amortized over all iters).
            out = fe(imgs, layer=layer, feature_type="patch")
            np.asarray(out[0, 0, :1])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fe(imgs, layer=layer, feature_type="patch")
            np.asarray(out[0, 0, :1])
            dt = (time.perf_counter() - t0) / args.iters
            per = 1e3 * dt / b
            tf = flops * b / dt / 1e12
            print(f"{label} b={b:>2}: {1e3 * dt:7.2f} ms/batch  {per:6.2f} ms/img  "
                  f"{tf:6.1f} TFLOP/s")

    fe = DinoFeatureExtractor(cfg)
    run(fe, "flash")
    if not args.tiny:
        fe_d = DinoFeatureExtractor(dataclasses.replace(cfg, use_flash=False))
        fe_d.params = fe.params
        run(fe_d, "dense")


if __name__ == "__main__":
    main()
