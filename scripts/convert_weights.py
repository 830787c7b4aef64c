"""Convert released torch checkpoints into this framework's .npz params.

One CLI for every model family (SURVEY.md §2.5): pass the torch state-dict
file (torch.hub / HF `pytorch_model.bin` / SAM2 .pt) and the model kind; the
matching converter from freepose_tpu.models.convert / models.sam2.convert
maps it onto the Flax pytree, saved as a flat .npz consumed by the other CLIs
via --weights.

Examples:
  python -m scripts.convert_weights --kind dinov2-hub --ckpt dinov2_vitl14_reg.pth \
      --layers 24 --out dinov2_l.npz
  python -m scripts.convert_weights --kind sam2-video --ckpt sam2_hf_state.bin \
      --out sam2.npz
"""
from __future__ import annotations

import argparse

from scripts.common import save_params


def load_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "module"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return obj


def main() -> None:
    from freepose_tpu.models import convert as C
    from freepose_tpu.models.sam2 import convert as S

    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True, choices=[
        "dinov2-hub", "dinov2-hf", "clip-openclip", "clip-hf",
        "swin-hf", "bert-hf", "grounding-dino-hf", "sam2-image-hf", "sam2-video-hf",
        "zoedepth-hf", "cotracker2-hub",
    ])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--layers", type=int, default=24, help="transformer depth")
    ap.add_argument("--text-layers", type=int, default=12)
    ap.add_argument("--vision-layers", type=int, default=48)
    ap.add_argument("--total-blocks", type=int, default=48, help="hiera/swin total blocks")
    ap.add_argument("--swin-depths", type=int, nargs="+", default=[2, 2, 18, 2],
                    help="Swin stage depths; default = grounding-dino-base "
                         "(Swin-B). Pass 2 2 6 2 for a Swin-T checkpoint.")
    args = ap.parse_args()

    sd = load_state_dict(args.ckpt)
    if args.kind == "dinov2-hub":
        params = C.dinov2_from_hub(sd, args.layers)
    elif args.kind == "dinov2-hf":
        params = C.dinov2_from_hf(sd, args.layers)
    elif args.kind == "clip-openclip":
        params = C.clip_from_open_clip(sd, args.vision_layers, args.text_layers)
    elif args.kind == "clip-hf":
        params = C.clip_from_hf(sd, args.vision_layers, args.text_layers)
    elif args.kind == "swin-hf":
        params = C.swin_from_hf(sd, args.swin_depths, out_stages=[1, 2, 3])
    elif args.kind == "bert-hf":
        params = C.bert_from_hf(sd, args.layers)
    elif args.kind == "grounding-dino-hf":
        params = C.grounding_dino_from_hf(
            sd, swin_depths=args.swin_depths, swin_out_stages=[1, 2, 3],
            text_layers=args.text_layers,
        )
    elif args.kind == "zoedepth-hf":
        params = C.zoedepth_from_hf(sd, num_layers=args.layers)
    elif args.kind == "cotracker2-hub":
        params = C.cotracker2_from_hub(sd)
    elif args.kind == "sam2-image-hf":
        params = S.sam2_image_model_from_hf(sd, total_blocks=args.total_blocks)
    elif args.kind == "sam2-video-hf":
        params = S.sam2_video_model_from_hf(sd, total_blocks=args.total_blocks)
    else:
        raise ValueError(args.kind)
    save_params(params, args.out)
    print(f"{args.kind}: {args.ckpt} -> {args.out}")


if __name__ == "__main__":
    main()
