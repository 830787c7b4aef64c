"""SAM2 Hiera + FPN parity vs HF transformers Sam2VisionModel (random-init)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models.sam2.convert import fpn_neck_from_hf, hiera_from_hf
from freepose_tpu.models.sam2.hiera import FpnNeck, Hiera, HieraConfig

CFG = HieraConfig(
    embed_dim=8,
    blocks_per_stage=(1, 1, 1, 1),
    embed_dim_per_stage=(8, 16, 32, 64),
    heads_per_stage=(1, 2, 4, 8),
    window_size_per_stage=(4, 4, 4, 4),
    global_attention_blocks=(9,),  # none active in 4 blocks
    window_pos_bg_size=(2, 2),
)


@pytest.fixture(scope="module")
def hf_vision():
    from transformers.models.sam2.configuration_sam2 import (
        Sam2HieraDetConfig,
        Sam2VisionConfig,
    )
    from transformers import Sam2VisionModel

    torch.manual_seed(0)
    bb = Sam2HieraDetConfig(
        hidden_size=CFG.embed_dim,
        num_attention_heads=1,
        blocks_per_stage=list(CFG.blocks_per_stage),
        embed_dim_per_stage=list(CFG.embed_dim_per_stage),
        num_attention_heads_per_stage=list(CFG.heads_per_stage),
        window_size_per_stage=list(CFG.window_size_per_stage),
        global_attention_blocks=list(CFG.global_attention_blocks),
        window_positional_embedding_background_size=list(CFG.window_pos_bg_size),
        image_size=[64, 64],
    )
    vc = Sam2VisionConfig(
        backbone_config=bb,
        backbone_channel_list=[64, 32, 16, 8],
        fpn_hidden_size=16,
        backbone_feature_sizes=[[16, 16], [8, 8], [4, 4]],
        fpn_top_down_levels=[2, 3],
    )
    model = Sam2VisionModel(vc).eval()
    # Random-perturb pos embeds (HF inits them to zero).
    with torch.no_grad():
        model.backbone.pos_embed.normal_(0, 0.02)
        model.backbone.pos_embed_window.normal_(0, 0.02)
    return model


def test_hiera_stage_parity(hf_vision):
    sd = hf_vision.state_dict()
    params = hiera_from_hf(sd, total_blocks=4)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf_vision.backbone(torch.tensor(img))
    ours = Hiera(CFG).apply({"params": params}, jnp.asarray(img))
    assert len(ours) == 4
    for i, (o, r) in enumerate(zip(ours, ref.intermediate_hidden_states)):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy(), atol=3e-4, err_msg=f"stage {i}"
        )


def test_fpn_parity(hf_vision):
    sd = hf_vision.state_dict()
    hiera_params = hiera_from_hf(sd, total_blocks=4)
    neck_params = fpn_neck_from_hf(sd, n_convs=4)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf_vision(torch.tensor(img))
    stages = Hiera(CFG).apply({"params": hiera_params}, jnp.asarray(img))
    feats, pos = FpnNeck(fpn_dim=16, top_down_levels=(2, 3), num_feature_levels=3).apply(
        {"params": neck_params}, stages
    )
    assert len(feats) == 3
    for i in range(3):
        ref_f = ref.fpn_hidden_states[i].numpy()  # [B, C, H, W]
        np.testing.assert_allclose(
            np.asarray(feats[i]).transpose(0, 3, 1, 2), ref_f, atol=3e-4, err_msg=f"level {i}"
        )
        ref_p = ref.fpn_position_encoding[i].numpy()
        np.testing.assert_allclose(
            np.asarray(pos[i]).transpose(2, 0, 1), ref_p[0], atol=1e-4, err_msg=f"pos {i}"
        )


def test_hiera_with_qpool_and_global_attention():
    # Exercise q-pooling + a global block on our side standalone (shapes).
    cfg = HieraConfig(
        embed_dim=8, blocks_per_stage=(1, 2, 1, 1), embed_dim_per_stage=(8, 16, 32, 64),
        heads_per_stage=(1, 2, 4, 8), window_size_per_stage=(4, 2, 2, 2),
        global_attention_blocks=(2,), window_pos_bg_size=(2, 2),
    )
    import jax

    model = Hiera(cfg)
    img = jnp.zeros((1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    outs = model.apply({"params": params}, img)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 32), (1, 2, 2, 64),
    ]
