"""One-command released-weights drop-in (VERDICT r4 #5).

The moment the released checkpoints are obtainable (this build environment
has zero egress), drop them under --ckpt-dir with the EXACT filenames below
and run:

    make weights           # == python -m scripts.prepare_weights && gated smoke

Converts every family found into this framework's .npz params (consumed by
the pipeline CLIs via --weights / scripts.common.load_params), skips missing
files with a note, then `pytest -m weights` smokes each converted family
(load -> production config forward -> finite outputs) plus a real-weight
feature slice. See docs/WEIGHTS.md for the full BOP/video eval runbook (the
BASELINE.md AR-within-1% gate).

Expected checkpoint files (sources in parentheses; all public):

  dinov2_vitl14_reg4_pretrain.pth   torch.hub facebookresearch/dinov2
  dinov2_vitb14_reg4_pretrain.pth   torch.hub facebookresearch/dinov2
  open_clip_pytorch_model.bin       HF laion/CLIP-ViT-bigG-14-laion2B-39B-b160k
  grounding-dino-base.bin           HF IDEA-Research/grounding-dino-base
                                    (pytorch_model.bin, Swin-B backbone —
                                    reference extract_proposals_ground.py:48)
  sam2-hiera-large.bin              HF facebook/sam2-hiera-large (transformers
                                    Sam2VideoModel state dict; the reference's
                                    sam2_hiera_large.pt holds the same tensors
                                    under original-repo names)
  zoedepth-nyu.bin                  HF Intel/zoedepth-nyu (pytorch_model.bin)
  cotracker2.pth                    torch.hub facebookresearch/co-tracker
"""
from __future__ import annotations

import argparse
from pathlib import Path

# (filename, output npz, converter fn, kwargs) — converter signatures from
# scripts/convert_weights.py (the single-file CLI this batches over).
FAMILIES = [
    ("dinov2_vitl14_reg4_pretrain.pth", "dinov2_vitl.npz", "dinov2-hub", {"layers": 24}),
    ("dinov2_vitb14_reg4_pretrain.pth", "dinov2_vitb.npz", "dinov2-hub", {"layers": 12}),
    ("open_clip_pytorch_model.bin", "clip_bigg.npz", "clip-openclip",
     {"vision_layers": 48, "text_layers": 32}),
    ("grounding-dino-base.bin", "grounding_dino.npz", "grounding-dino-hf",
     {"swin_depths": [2, 2, 18, 2], "text_layers": 12}),
    ("sam2-hiera-large.bin", "sam2_hiera_l.npz", "sam2-video-hf", {"total_blocks": 48}),
    ("zoedepth-nyu.bin", "zoedepth.npz", "zoedepth-hf", {"layers": 24}),
    ("cotracker2.pth", "cotracker2.npz", "cotracker2-hub", {}),
]


def convert_one(ckpt: Path, out: Path, kind: str, kw: dict) -> None:
    from freepose_tpu.models import convert as C
    from freepose_tpu.models.sam2 import convert as S
    from scripts.common import save_params
    from scripts.convert_weights import load_state_dict

    sd = load_state_dict(str(ckpt))
    if kind == "dinov2-hub":
        params = C.dinov2_from_hub(sd, kw["layers"])
    elif kind == "clip-openclip":
        params = C.clip_from_open_clip(sd, kw["vision_layers"], kw["text_layers"])
    elif kind == "grounding-dino-hf":
        params = C.grounding_dino_from_hf(
            sd, swin_depths=kw["swin_depths"], swin_out_stages=[1, 2, 3],
            text_layers=kw["text_layers"])
    elif kind == "sam2-video-hf":
        params = S.sam2_video_model_from_hf(sd, total_blocks=kw["total_blocks"])
    elif kind == "zoedepth-hf":
        params = C.zoedepth_from_hf(sd, num_layers=kw["layers"])
    elif kind == "cotracker2-hub":
        params = C.cotracker2_from_hub(sd)
    else:
        raise ValueError(kind)
    save_params(params, out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="data/checkpoints")
    ap.add_argument("--out-dir", default="data/params")
    ap.add_argument("--force", action="store_true", help="reconvert existing outputs")
    args = ap.parse_args()

    ckpt_dir, out_dir = Path(args.ckpt_dir), Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_done = n_skip = 0
    for fname, out_name, kind, kw in FAMILIES:
        src, dst = ckpt_dir / fname, out_dir / out_name
        if not src.exists():
            print(f"MISSING  {src}  (skipping {out_name}; see module docstring "
                  f"for the expected source)")
            n_skip += 1
            continue
        if dst.exists() and not args.force:
            print(f"exists   {dst}  (--force to reconvert)")
            n_done += 1
            continue
        print(f"convert  {src} -> {dst}  [{kind}]", flush=True)
        convert_one(src, dst, kind, kw)
        n_done += 1
    print(f"{n_done} families ready, {n_skip} missing under {ckpt_dir}/")
    if n_skip == 0:
        print("all 7 families converted — run `pytest -m weights -q` "
              "then the docs/WEIGHTS.md eval runbook")


if __name__ == "__main__":
    main()
