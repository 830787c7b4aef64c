"""Shared CLI plumbing: model/weight loading, naming conventions, sharding.

The reference encodes hyperparameters in artifact FILENAMES
(extract_proposals_ground.py:36, dino_inference.py:38); those name templates
are reproduced here so artifacts interoperate, while every knob is also a
proper flag.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def proposals_filename(box_thresh, text_thresh, feature_type, layer, topk, dataset_name) -> str:
    """Reference name template (extract_proposals_ground.py:36)."""
    return (
        f"props-ground-box-{box_thresh}-text-{text_thresh}-{feature_type}-{layer}"
        f"-top-{topk}_{dataset_name}.json"
    )


def add_shard_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--shard-index", type=int, default=None, help="worker index (defaults to env)")
    ap.add_argument("--shard-count", type=int, default=None, help="worker count (defaults to env)")


def get_shard(args):
    from freepose_tpu.parallel.scheduler import current_shard

    return current_shard(args.shard_index, args.shard_count)


def load_filelist(path: str | Path) -> list[str]:
    return [line.strip() for line in Path(path).read_text().splitlines() if line.strip()]


def load_dino_extractor(weights: str | None, model: str = "vitl", layer_default: int = 22):
    """DINOv2 extractor; random-init when no converted weights are given
    (weights: .npz of converted Flax params or a torch checkpoint).
    FREEPOSE_TINY_MODELS=1 swaps in the tiny test config (CI / smoke runs)."""
    import os

    from freepose_tpu.models.dinov2 import (
        VIT_B14_REG,
        VIT_L14_REG,
        VIT_TEST,
        DinoFeatureExtractor,
    )

    if os.environ.get("FREEPOSE_TINY_MODELS"):
        cfg = VIT_TEST
    else:
        import dataclasses

        import jax
        import jax.numpy as jnp

        cfg = {"vitl": VIT_L14_REG, "vitb": VIT_B14_REG}[model]
        # Production path: bf16 (the reference's inference dtype) + the Pallas
        # flash-attention kernel on TPU (falls back to dense elsewhere).
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16 if on_tpu else cfg.dtype, use_flash=on_tpu)
    params = load_params(weights) if weights else None
    return DinoFeatureExtractor(cfg, params=params)


def load_params(path: str | Path):
    """Load converted Flax params from .npz (flat '/'-joined keys) or a torch
    .pt/.pth state dict via the converters."""
    path = Path(path)
    if path.suffix == ".npz":
        flat = dict(np.load(path))
        return unflatten(flat)
    raise ValueError(
        f"unsupported weights file {path}; convert torch checkpoints with "
        "freepose_tpu.models.convert and save as .npz"
    )


def unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_params(params: dict, path: str | Path) -> None:
    np.savez(Path(path), **flatten(params))


def _on_accelerator() -> bool:
    import jax

    return jax.devices()[0].platform in ("tpu", "axon", "gpu")


def production_gdino_config():
    """GroundingDINO config at the production dtype: bf16 on accelerators
    (the reference's torch inference dtype), f32 on CPU. Nested Swin/BERT
    dtypes follow. FREEPOSE_TINY_MODELS=1 swaps the tiny test config."""
    import dataclasses
    import os

    import jax.numpy as jnp

    from freepose_tpu.models.grounding_dino import GDINO_TEST, GroundingDinoConfig

    if os.environ.get("FREEPOSE_TINY_MODELS"):
        return GDINO_TEST
    cfg = GroundingDinoConfig()
    if _on_accelerator():
        bf = jnp.bfloat16
        cfg = dataclasses.replace(
            cfg, dtype=bf,
            swin=dataclasses.replace(cfg.swin, dtype=bf),
            text=dataclasses.replace(cfg.text, dtype=bf),
        )
    return cfg


def production_sam2_config():
    """SAM2 hiera-L config at the production dtype (see
    production_gdino_config). Returns (config, image_size)."""
    import dataclasses
    import os

    import jax.numpy as jnp

    from freepose_tpu.models.sam2.model import SAM2_TEST, Sam2Config

    if os.environ.get("FREEPOSE_TINY_MODELS"):
        return SAM2_TEST, 64
    cfg = Sam2Config()
    if _on_accelerator():
        bf = jnp.bfloat16
        cfg = dataclasses.replace(
            cfg, dtype=bf,
            # use_flash: Pallas flash attention in the global-attention
            # blocks — Hiera-L @1024² trunk measured 114.4 -> 39.9 ms on one
            # v5e (dense materializes [8, 4096, 4096] f32 scores per global
            # block).
            hiera=dataclasses.replace(cfg.hiera, dtype=bf, use_flash=True),
            prompt=dataclasses.replace(cfg.prompt, dtype=bf),
            decoder=dataclasses.replace(cfg.decoder, dtype=bf),
        )
    return cfg, 1024


def production_sam2_video_config():
    """SAM2 video-tracking config at the production dtype (bf16 trunk on
    accelerators, the measured bench configuration — scripts/bench_e2e.py)."""
    import os

    if os.environ.get("FREEPOSE_TINY_MODELS"):
        from tests.test_sam2_video import OUR_CFG

        return OUR_CFG
    from freepose_tpu.models.sam2.video import Sam2VideoConfig

    cfg, _ = production_sam2_config()
    vcfg = Sam2VideoConfig(sam=cfg)
    if _on_accelerator():
        import dataclasses

        import jax.numpy as jnp

        # Streaming flash kernel for the ~28.7k-key memory cross-attention
        # (4 layers, 4096 queries): 101.7 -> 13.0 ms measured on one v5e.
        # bf16 memory attention/encoder matches the reference's torch
        # inference dtype (like the trunk) and halves the stream kernel's
        # K/V traffic — the r5 chunk profile showed the 4 stream kernels
        # running f32 at 3.5 ms/frame.
        vcfg = dataclasses.replace(
            vcfg, mem=dataclasses.replace(vcfg.mem, use_flash=True, dtype=jnp.bfloat16)
        )
    return vcfg
