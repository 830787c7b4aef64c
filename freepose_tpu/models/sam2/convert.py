"""HF Sam2 checkpoint -> Flax parameter converters for the SAM2 stack."""
from __future__ import annotations

import numpy as np


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def _dense(sd, p):
    return {"kernel": _t(sd[f"{p}.weight"]).T, "bias": _t(sd[f"{p}.bias"])}


def _ln(sd, p):
    return {"scale": _t(sd[f"{p}.weight"]), "bias": _t(sd[f"{p}.bias"])}


def _conv(sd, p):
    out = {"kernel": _t(sd[f"{p}.weight"]).transpose(2, 3, 1, 0)}
    if f"{p}.bias" in sd:
        out["bias"] = _t(sd[f"{p}.bias"])
    return out


def hiera_from_hf(sd: dict, total_blocks: int, prefix: str = "backbone") -> dict:
    """HF Sam2HieraDetModel state dict -> Hiera Flax params."""
    params = {
        "patch_embed": _conv(sd, f"{prefix}.patch_embed.projection"),
        "pos_embed": _t(sd[f"{prefix}.pos_embed"]).transpose(0, 2, 3, 1),
        "pos_embed_window": _t(sd[f"{prefix}.pos_embed_window"]).transpose(0, 2, 3, 1),
    }
    for i in range(total_blocks):
        p = f"{prefix}.blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{p}.layer_norm1"),
            "attn": {"qkv": _dense(sd, f"{p}.attn.qkv"), "proj": _dense(sd, f"{p}.attn.proj")},
            "norm2": _ln(sd, f"{p}.layer_norm2"),
            "mlp": {"fc1": _dense(sd, f"{p}.mlp.proj_in"), "fc2": _dense(sd, f"{p}.mlp.proj_out")},
        }
        if f"{p}.proj.weight" in sd:
            blk["proj"] = _dense(sd, f"{p}.proj")
        params[f"block{i}"] = blk
    return params


def fpn_neck_from_hf(sd: dict, n_convs: int, prefix: str = "neck") -> dict:
    return {f"conv{j}": _conv(sd, f"{prefix}.convs.{j}") for j in range(n_convs)}
