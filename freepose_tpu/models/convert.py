"""Torch-checkpoint -> Flax parameter converters.

The reference pulls all model weights from torch.hub / HF
(SURVEY.md §2.5). This module maps those released state dicts into this
framework's Flax pytrees. Conversion is pure numpy (no torch needed at
inference time — pass any mapping of name -> array).
"""
from __future__ import annotations

import numpy as np


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def _dense(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]).T, "bias": _t(sd[f"{prefix}.bias"])}


def _layernorm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def stack_layers(per_layer: list[dict]) -> dict:
    """Stack a list of identical param trees along a new leading axis — the
    layout nn.scan'd transformer stacks expect (variable_axes={'params': 0})."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *per_layer)


def dinov2_from_hf(state_dict: dict, num_layers: int) -> dict:
    """HF Dinov2WithRegistersModel state dict -> DinoV2 Flax params.

    HF layout (transformers.models.dinov2_with_registers): embeddings.* +
    encoder.layer.{i}.{norm1, attention.attention.{query,key,value},
    attention.output.dense, layer_scale1.lambda1, norm2, mlp.fc1/fc2,
    layer_scale2.lambda1} + layernorm.
    """
    sd = state_dict
    params: dict = {}
    proj_w = _t(sd["embeddings.patch_embeddings.projection.weight"])  # [D, 3, P, P]
    params["patch_embed"] = {
        "kernel": proj_w.transpose(2, 3, 1, 0),  # HWIO
        "bias": _t(sd["embeddings.patch_embeddings.projection.bias"]),
    }
    params["cls_token"] = _t(sd["embeddings.cls_token"])
    params["reg_tokens"] = _t(sd["embeddings.register_tokens"])
    params["pos_embed"] = _t(sd["embeddings.position_embeddings"])
    params["norm"] = _layernorm(sd, "layernorm")

    layers = []
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        q = _t(sd[f"{p}.attention.attention.query.weight"])
        k = _t(sd[f"{p}.attention.attention.key.weight"])
        v = _t(sd[f"{p}.attention.attention.value.weight"])
        qb = _t(sd[f"{p}.attention.attention.query.bias"])
        kb = _t(sd[f"{p}.attention.attention.key.bias"])
        vb = _t(sd[f"{p}.attention.attention.value.bias"])
        layers.append({
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "attn": {
                "qkv": {
                    "kernel": np.concatenate([q, k, v], axis=0).T,
                    "bias": np.concatenate([qb, kb, vb]),
                },
                "proj": _dense(sd, f"{p}.attention.output.dense"),
            },
            "ls1": {"gamma": _t(sd[f"{p}.layer_scale1.lambda1"])},
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "mlp": {"fc1": _dense(sd, f"{p}.mlp.fc1"), "fc2": _dense(sd, f"{p}.mlp.fc2")},
            "ls2": {"gamma": _t(sd[f"{p}.layer_scale2.lambda1"])},
        })
    params["blocks"] = {"block": stack_layers(layers)}
    return params


def dinov2_from_hub(state_dict: dict, num_layers: int) -> dict:
    """facebookresearch/dinov2 torch.hub state dict -> DinoV2 Flax params.

    Hub layout: patch_embed.proj, cls_token, register_tokens, pos_embed,
    blocks.{i}.{norm1, attn.qkv, attn.proj, ls1.gamma, norm2,
    mlp.fc1/fc2, ls2.gamma}, norm.
    """
    sd = state_dict
    params: dict = {}
    proj_w = _t(sd["patch_embed.proj.weight"])
    params["patch_embed"] = {
        "kernel": proj_w.transpose(2, 3, 1, 0),
        "bias": _t(sd["patch_embed.proj.bias"]),
    }
    params["cls_token"] = _t(sd["cls_token"])
    params["reg_tokens"] = _t(sd["register_tokens"])
    params["pos_embed"] = _t(sd["pos_embed"])
    params["norm"] = _layernorm(sd, "norm")
    layers = []
    for i in range(num_layers):
        p = f"blocks.{i}"
        layers.append({
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "attn": {
                "qkv": _dense(sd, f"{p}.attn.qkv"),
                "proj": _dense(sd, f"{p}.attn.proj"),
            },
            "ls1": {"gamma": _t(sd[f"{p}.ls1.gamma"])},
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "mlp": {"fc1": _dense(sd, f"{p}.mlp.fc1"), "fc2": _dense(sd, f"{p}.mlp.fc2")},
            "ls2": {"gamma": _t(sd[f"{p}.ls2.gamma"])},
        })
    params["blocks"] = {"block": stack_layers(layers)}
    return params


def _clip_layer(sd, p):
    q = _t(sd[f"{p}.self_attn.q_proj.weight"])
    k = _t(sd[f"{p}.self_attn.k_proj.weight"])
    v = _t(sd[f"{p}.self_attn.v_proj.weight"])
    qb = _t(sd[f"{p}.self_attn.q_proj.bias"])
    kb = _t(sd[f"{p}.self_attn.k_proj.bias"])
    vb = _t(sd[f"{p}.self_attn.v_proj.bias"])
    return {
        "ln1": _layernorm(sd, f"{p}.layer_norm1"),
        "qkv": {
            "kernel": np.concatenate([q, k, v], axis=0).T,
            "bias": np.concatenate([qb, kb, vb]),
        },
        "proj": _dense(sd, f"{p}.self_attn.out_proj"),
        "ln2": _layernorm(sd, f"{p}.layer_norm2"),
        "fc1": _dense(sd, f"{p}.mlp.fc1"),
        "fc2": _dense(sd, f"{p}.mlp.fc2"),
    }


def clip_from_hf(state_dict: dict, vision_layers: int, text_layers: int) -> dict:
    """HF transformers CLIPModel state dict -> Clip Flax params."""
    sd = state_dict
    visual = {
        "patch_embed": {
            "kernel": _t(sd["vision_model.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0)
        },
        "class_embedding": _t(sd["vision_model.embeddings.class_embedding"]),
        "pos_embed": _t(sd["vision_model.embeddings.position_embedding.weight"]),
        "ln_pre": _layernorm(sd, "vision_model.pre_layrnorm"),
        "ln_post": _layernorm(sd, "vision_model.post_layernorm"),
        "proj": _t(sd["visual_projection.weight"]).T,
    }
    visual["layers"] = {"layer": stack_layers(
        [_clip_layer(sd, f"vision_model.encoder.layers.{i}") for i in range(vision_layers)]
    )}
    text = {
        "token_embedding": _t(sd["text_model.embeddings.token_embedding.weight"]),
        "pos_embed": _t(sd["text_model.embeddings.position_embedding.weight"]),
        "ln_final": _layernorm(sd, "text_model.final_layer_norm"),
        "text_proj": _t(sd["text_projection.weight"]).T,
    }
    text["layers"] = {"layer": stack_layers(
        [_clip_layer(sd, f"text_model.encoder.layers.{i}") for i in range(text_layers)]
    )}
    return {"visual": visual, "text": text}


def _open_clip_layer(sd, p):
    """open_clip resblock (attn.in_proj_weight fused qkv)."""
    return {
        "ln1": _layernorm(sd, f"{p}.ln_1"),
        "qkv": {
            "kernel": _t(sd[f"{p}.attn.in_proj_weight"]).T,
            "bias": _t(sd[f"{p}.attn.in_proj_bias"]),
        },
        "proj": _dense(sd, f"{p}.attn.out_proj"),
        "ln2": _layernorm(sd, f"{p}.ln_2"),
        "fc1": _dense(sd, f"{p}.mlp.c_fc"),
        "fc2": _dense(sd, f"{p}.mlp.c_proj"),
    }


def clip_from_open_clip(state_dict: dict, vision_layers: int, text_layers: int) -> dict:
    """open_clip (e.g. ViT-bigG-14 laion2b) state dict -> Clip Flax params."""
    sd = state_dict
    visual = {
        "patch_embed": {"kernel": _t(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _t(sd["visual.class_embedding"]),
        "pos_embed": _t(sd["visual.positional_embedding"]),
        "ln_pre": _layernorm(sd, "visual.ln_pre"),
        "ln_post": _layernorm(sd, "visual.ln_post"),
        "proj": _t(sd["visual.proj"]),
    }
    visual["layers"] = {"layer": stack_layers(
        [_open_clip_layer(sd, f"visual.transformer.resblocks.{i}") for i in range(vision_layers)]
    )}
    text = {
        "token_embedding": _t(sd["token_embedding.weight"]),
        "pos_embed": _t(sd["positional_embedding"]),
        "ln_final": _layernorm(sd, "ln_final"),
        "text_proj": _t(sd["text_projection"]),
    }
    text["layers"] = {"layer": stack_layers(
        [_open_clip_layer(sd, f"transformer.resblocks.{i}") for i in range(text_layers)]
    )}
    return {"visual": visual, "text": text}


def swin_from_hf(sd: dict, depths, out_stages, prefix: str = "") -> dict:
    """HF SwinBackbone/SwinModel state dict -> SwinBackbone Flax params."""
    p = prefix
    params = {
        "patch_embed": {
            "kernel": _t(sd[f"{p}embeddings.patch_embeddings.projection.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{p}embeddings.patch_embeddings.projection.bias"]),
        },
        "embed_norm": _layernorm(sd, f"{p}embeddings.norm"),
    }
    for stage, depth in enumerate(depths):
        for blk in range(depth):
            bp = f"{p}encoder.layers.{stage}.blocks.{blk}"
            q = _t(sd[f"{bp}.attention.self.query.weight"])
            k = _t(sd[f"{bp}.attention.self.key.weight"])
            v = _t(sd[f"{bp}.attention.self.value.weight"])
            qb = _t(sd[f"{bp}.attention.self.query.bias"])
            kb = _t(sd[f"{bp}.attention.self.key.bias"])
            vb = _t(sd[f"{bp}.attention.self.value.bias"])
            params[f"stage{stage}_block{blk}"] = {
                "ln1": _layernorm(sd, f"{bp}.layernorm_before"),
                "qkv": {
                    "kernel": np.concatenate([q, k, v], axis=0).T,
                    "bias": np.concatenate([qb, kb, vb]),
                },
                "rel_bias_table": _t(sd[f"{bp}.attention.self.relative_position_bias_table"]),
                "proj": _dense(sd, f"{bp}.attention.output.dense"),
                "ln2": _layernorm(sd, f"{bp}.layernorm_after"),
                "fc1": _dense(sd, f"{bp}.intermediate.dense"),
                "fc2": _dense(sd, f"{bp}.output.dense"),
            }
        if f"{p}encoder.layers.{stage}.downsample.reduction.weight" in sd:
            params[f"downsample{stage}"] = {
                "norm": _layernorm(sd, f"{p}encoder.layers.{stage}.downsample.norm"),
                "reduction": {"kernel": _t(sd[f"{p}encoder.layers.{stage}.downsample.reduction.weight"]).T},
            }
    for stage in out_stages:
        key = f"{p}hidden_states_norms.stage{stage + 1}"
        if f"{key}.weight" in sd:
            params[f"out_norm{stage}"] = _layernorm(sd, key)
    return params


def bert_from_hf(sd: dict, num_layers: int, prefix: str = "") -> dict:
    """HF BertModel state dict -> Bert Flax params."""
    p = prefix
    params = {
        "word_embeddings": _t(sd[f"{p}embeddings.word_embeddings.weight"]),
        "position_embeddings": _t(sd[f"{p}embeddings.position_embeddings.weight"]),
        "token_type_embeddings": _t(sd[f"{p}embeddings.token_type_embeddings.weight"]),
        "embed_ln": _layernorm(sd, f"{p}embeddings.LayerNorm"),
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}"
        params[f"layer{i}"] = {
            "q": _dense(sd, f"{lp}.attention.self.query"),
            "k": _dense(sd, f"{lp}.attention.self.key"),
            "v": _dense(sd, f"{lp}.attention.self.value"),
            "attn_out": _dense(sd, f"{lp}.attention.output.dense"),
            "attn_ln": _layernorm(sd, f"{lp}.attention.output.LayerNorm"),
            "fc1": _dense(sd, f"{lp}.intermediate.dense"),
            "fc2": _dense(sd, f"{lp}.output.dense"),
            "out_ln": _layernorm(sd, f"{lp}.output.LayerNorm"),
        }
    return params


def _gd_mha(sd, p):
    return {
        "q": _dense(sd, f"{p}.query"),
        "k": _dense(sd, f"{p}.key"),
        "v": _dense(sd, f"{p}.value"),
        "out": _dense(sd, f"{p}.out_proj"),
    }


def _gd_msda(sd, p):
    return {
        "value_proj": _dense(sd, f"{p}.value_proj"),
        "sampling_offsets": _dense(sd, f"{p}.sampling_offsets"),
        "attention_weights": _dense(sd, f"{p}.attention_weights"),
        "output_proj": _dense(sd, f"{p}.output_proj"),
    }


def _gd_mlp_head(sd, p, n_layers=3):
    return {f"layer{i}": _dense(sd, f"{p}.layers.{i}") for i in range(n_layers)}


def grounding_dino_from_hf(sd: dict, swin_depths, swin_out_stages, text_layers: int,
                           encoder_layers: int = 6, decoder_layers: int = 6,
                           num_backbone_levels: int = 3, num_levels: int = 4) -> dict:
    """HF GroundingDinoForObjectDetection state dict -> GroundingDino params."""
    params: dict = {
        "backbone": swin_from_hf(sd, swin_depths, swin_out_stages,
                                 prefix="model.backbone.conv_encoder.model."),
        "text_backbone": bert_from_hf(sd, text_layers, prefix="model.text_backbone."),
        "text_projection": _dense(sd, "model.text_projection"),
        "level_embed": _t(sd["model.level_embed"]),
        "query_embeds": _t(sd["model.query_position_embeddings.weight"]),
        "enc_output": _dense(sd, "model.enc_output"),
        "enc_output_norm": _layernorm(sd, "model.enc_output_norm"),
        "enc_bbox_head": _gd_mlp_head(sd, "model.encoder_output_bbox_embed"),
        "ref_point_head": _gd_mlp_head(sd, "model.decoder.reference_points_head", 2),
        "decoder_ln": _layernorm(sd, "model.decoder.layer_norm"),
    }
    for i in range(num_levels):
        params[f"input_proj{i}"] = _conv_gd(sd, f"model.input_proj_vision.{i}.0")
        params[f"input_gn{i}"] = _layernorm(sd, f"model.input_proj_vision.{i}.1")
    for i in range(encoder_layers):
        p = f"model.encoder.layers.{i}"
        params[f"enc{i}"] = {
            "fusion_ln_v": _layernorm(sd, f"{p}.fusion_layer.layer_norm_vision"),
            "fusion_ln_t": _layernorm(sd, f"{p}.fusion_layer.layer_norm_text"),
            "fusion_attn": {
                "vision_proj": _dense(sd, f"{p}.fusion_layer.attn.vision_proj"),
                "text_proj": _dense(sd, f"{p}.fusion_layer.attn.text_proj"),
                "values_vision_proj": _dense(sd, f"{p}.fusion_layer.attn.values_vision_proj"),
                "values_text_proj": _dense(sd, f"{p}.fusion_layer.attn.values_text_proj"),
                "out_vision_proj": _dense(sd, f"{p}.fusion_layer.attn.out_vision_proj"),
                "out_text_proj": _dense(sd, f"{p}.fusion_layer.attn.out_text_proj"),
            },
            "fusion_vision_scale": _t(sd[f"{p}.fusion_layer.vision_param"]),
            "fusion_text_scale": _t(sd[f"{p}.fusion_layer.text_param"]),
            "text_attn": _gd_mha(sd, f"{p}.text_enhancer_layer.self_attn"),
            "text_ln1": _layernorm(sd, f"{p}.text_enhancer_layer.layer_norm_before"),
            "text_fc1": _dense(sd, f"{p}.text_enhancer_layer.fc1"),
            "text_fc2": _dense(sd, f"{p}.text_enhancer_layer.fc2"),
            "text_ln2": _layernorm(sd, f"{p}.text_enhancer_layer.layer_norm_after"),
            "deform_attn": _gd_msda(sd, f"{p}.deformable_layer.self_attn"),
            "deform_ln1": _layernorm(sd, f"{p}.deformable_layer.self_attn_layer_norm"),
            "deform_fc1": _dense(sd, f"{p}.deformable_layer.fc1"),
            "deform_fc2": _dense(sd, f"{p}.deformable_layer.fc2"),
            "deform_ln2": _layernorm(sd, f"{p}.deformable_layer.final_layer_norm"),
        }
    for i in range(decoder_layers):
        p = f"model.decoder.layers.{i}"
        params[f"dec{i}"] = {
            "self_attn": _gd_mha(sd, f"{p}.self_attn"),
            "ln1": _layernorm(sd, f"{p}.self_attn_layer_norm"),
            "text_cross": _gd_mha(sd, f"{p}.encoder_attn_text"),
            "ln2": _layernorm(sd, f"{p}.encoder_attn_text_layer_norm"),
            "deform_cross": _gd_msda(sd, f"{p}.encoder_attn"),
            "ln3": _layernorm(sd, f"{p}.encoder_attn_layer_norm"),
            "fc1": _dense(sd, f"{p}.fc1"),
            "fc2": _dense(sd, f"{p}.fc2"),
            "ln_out": _layernorm(sd, f"{p}.final_layer_norm"),
        }
        params[f"dec_bbox{i}"] = _gd_mlp_head(sd, f"bbox_embed.{i}")
    return params


def _conv_gd(sd, p):
    return {
        "kernel": _t(sd[f"{p}.weight"]).transpose(2, 3, 1, 0),
        "bias": _t(sd[f"{p}.bias"]),
    }


def _conv(sd, p, bias=True):
    out = {"kernel": _t(sd[f"{p}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _t(sd[f"{p}.bias"])
    return out


def zoedepth_from_hf(sd: dict, num_layers: int = 24, reassemble_factors=(4, 2, 1, 0.5)) -> dict:
    """HF ZoeDepthForDepthEstimation state dict -> ZoeDepthModel Flax params.

    Covers the single-domain checkpoints (ZoeD_N layout; Intel/zoedepth-nyu):
    BEiT backbone with per-layer relative-position-bias tables, DPT
    reassemble/fusion neck, relative head, and the metric-bins head. Fusion
    layer 0's residual_layer1 exists in the torch checkpoint but is
    structurally unused (no skip input on the deepest level) and is skipped.
    """
    params: dict = {}

    # --- BEiT backbone (nn.scan stack) -------------------------------- #
    bb = "backbone"
    layers = []
    for i in range(num_layers):
        p = f"{bb}.encoder.layer.{i}"
        layers.append({
            "block": {
                "rel_pos_table": _t(
                    sd[f"{p}.attention.attention.relative_position_bias.relative_position_bias_table"]
                ),
                "ln1": _layernorm(sd, f"{p}.layernorm_before"),
                "ln2": _layernorm(sd, f"{p}.layernorm_after"),
                "q": _dense(sd, f"{p}.attention.attention.query"),
                "k": {"kernel": _t(sd[f"{p}.attention.attention.key.weight"]).T},
                "v": _dense(sd, f"{p}.attention.attention.value"),
                "proj": _dense(sd, f"{p}.attention.output.dense"),
                "fc1": _dense(sd, f"{p}.intermediate.dense"),
                "fc2": _dense(sd, f"{p}.output.dense"),
                "lambda_1": _t(sd[f"{p}.lambda_1"]),
                "lambda_2": _t(sd[f"{p}.lambda_2"]),
            }
        })
    params["backbone"] = {
        "patch_embed": _conv(sd, f"{bb}.embeddings.patch_embeddings.projection"),
        "cls_token": _t(sd[f"{bb}.embeddings.cls_token"]),
        "blocks": stack_layers(layers),
    }

    # --- Reassemble + neck convs -------------------------------------- #
    rs = "neck.reassemble_stage"
    reassemble: dict = {}
    for i, factor in enumerate(reassemble_factors):
        reassemble[f"readout{i}"] = _dense(sd, f"{rs}.readout_projects.{i}.0")
        reassemble[f"proj{i}"] = _conv(sd, f"{rs}.layers.{i}.projection")
        if factor > 1:
            reassemble[f"resize{i}_w"] = _t(sd[f"{rs}.layers.{i}.resize.weight"])
            reassemble[f"resize{i}_b"] = _t(sd[f"{rs}.layers.{i}.resize.bias"])
        elif factor < 1:
            reassemble[f"resize{i}"] = _conv(sd, f"{rs}.layers.{i}.resize")
    params["reassemble"] = reassemble
    for i in range(4):
        params[f"neck_conv{i}"] = _conv(sd, f"neck.convs.{i}", bias=False)

    # --- Fusion pyramid ------------------------------------------------ #
    def _res_unit(p):
        return {"conv1": _conv(sd, f"{p}.convolution1"), "conv2": _conv(sd, f"{p}.convolution2")}

    for i in range(4):
        p = f"neck.fusion_stage.layers.{i}"
        layer = {"proj": _conv(sd, f"{p}.projection"), "res2": _res_unit(f"{p}.residual_layer2")}
        if i > 0:  # layer 0 has no skip input; its res1 weights are dead
            layer["res1"] = _res_unit(f"{p}.residual_layer1")
        params[f"fusion{i}"] = layer

    # --- Relative head -------------------------------------------------- #
    params["rel_conv1"] = _conv(sd, "relative_head.conv1")
    params["rel_conv2"] = _conv(sd, "relative_head.conv2")
    params["rel_conv3"] = _conv(sd, "relative_head.conv3")

    # --- Metric-bins head ------------------------------------------------ #
    mh = "metric_head"
    params["mh_conv2"] = _conv(sd, f"{mh}.conv2")
    params["seed_bin"] = {"conv1": _conv(sd, f"{mh}.seed_bin_regressor.conv1"),
                          "conv2": _conv(sd, f"{mh}.seed_bin_regressor.conv2")}
    params["seed_proj"] = {"conv1": _conv(sd, f"{mh}.seed_projector.conv1"),
                           "conv2": _conv(sd, f"{mh}.seed_projector.conv2")}
    for i in range(4):
        params[f"mh_proj{i}"] = {"conv1": _conv(sd, f"{mh}.projectors.{i}.conv1"),
                                 "conv2": _conv(sd, f"{mh}.projectors.{i}.conv2")}
        params[f"attractor{i}"] = {"conv1": _conv(sd, f"{mh}.attractors.{i}.conv1"),
                                   "conv2": _conv(sd, f"{mh}.attractors.{i}.conv2")}
    params["clb"] = {"mlp1": _conv(sd, f"{mh}.conditional_log_binomial.mlp.0"),
                     "mlp2": _conv(sd, f"{mh}.conditional_log_binomial.mlp.2")}
    return params


def cotracker2_from_hub(sd: dict, depth: int = 6) -> dict:
    """facebookresearch/co-tracker `cotracker2` torch.hub state dict ->
    CoTracker2 Flax params (models/cotracker2.py).

    Hub layout (CoTracker2 model, reference tracking_refiner.py:24):
    fnet.{conv1, layer{1..4}.{0,1}.{conv1, conv2, downsample.0}, conv2,
    conv3}, updateformer.{input_transform, virual_tracks [sic],
    time_blocks.i.{attn.to_q/to_kv/to_out, mlp.fc1/fc2},
    space_{virtual,point2virtual,virtual2point}_blocks.i (cross blocks add
    norm_context), flow_head}, norm, track_feat_updater.0, vis_predictor.0.
    Instance norms and the affine-free pre-LayerNorms carry no params; the
    time_emb / pos_emb buffers are deterministic and recomputed.
    """
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    def res_block(p, down):
        out = {"conv1": _conv(sd, f"{p}.conv1"), "conv2": _conv(sd, f"{p}.conv2")}
        if down:
            out["down"] = _conv(sd, f"{p}.downsample.0")
        return out

    fnet = {"conv1": _conv(sd, "fnet.conv1"), "conv2": _conv(sd, "fnet.conv2"),
            "conv3": _conv(sd, "fnet.conv3")}
    for stage in range(1, 5):
        for blk in range(2):
            fnet[f"layer{stage}_{blk}"] = res_block(
                f"fnet.layer{stage}.{blk}", down=(stage > 1 and blk == 0)
            )

    def attn(p):
        return {"to_q": _dense(sd, f"{p}.to_q"), "to_kv": _dense(sd, f"{p}.to_kv"),
                "to_out": _dense(sd, f"{p}.to_out")}

    def attn_block(p):
        return {"attn": attn(f"{p}.attn"),
                "mlp": {"fc1": _dense(sd, f"{p}.mlp.fc1"), "fc2": _dense(sd, f"{p}.mlp.fc2")}}

    def cross_block(p):
        return {"cross_attn": attn(f"{p}.cross_attn"),
                "norm_context": _layernorm(sd, f"{p}.norm_context"),
                "mlp": {"fc1": _dense(sd, f"{p}.mlp.fc1"), "fc2": _dense(sd, f"{p}.mlp.fc2")}}

    layers = []
    for i in range(depth):
        layers.append({
            "time": attn_block(f"updateformer.time_blocks.{i}"),
            "virtual2point": cross_block(f"updateformer.space_virtual2point_blocks.{i}"),
            "virtual": attn_block(f"updateformer.space_virtual_blocks.{i}"),
            "point2virtual": cross_block(f"updateformer.space_point2virtual_blocks.{i}"),
        })

    # released code spells the param "virual_tracks"
    virt_key = "updateformer.virual_tracks" if "updateformer.virual_tracks" in sd \
        else "updateformer.virtual_tracks"
    updateformer = {
        "input_transform": _dense(sd, "updateformer.input_transform"),
        "flow_head": _dense(sd, "updateformer.flow_head"),
        "virtual_tracks": _t(sd[virt_key]).reshape(-1, 1, _t(sd[virt_key]).shape[-1]),
        "layers": stack_layers(layers),
    }
    return {
        "fnet": fnet,
        "updateformer": updateformer,
        "norm": {"scale": _t(sd["norm.weight"]), "bias": _t(sd["norm.bias"])},
        "track_feat_updater": _dense(sd, "track_feat_updater.0"),
        "vis_predictor": _dense(sd, "vis_predictor.0"),
    }
