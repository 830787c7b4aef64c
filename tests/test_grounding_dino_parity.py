"""End-to-end GroundingDINO parity vs HF GroundingDinoForObjectDetection
(tiny random-init config, converted weights)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models.bert import BertConfig
from freepose_tpu.models.convert import grounding_dino_from_hf
from freepose_tpu.models.grounding_dino import (
    GroundingDino,
    GroundingDinoConfig,
    text_token_masks,
)
from freepose_tpu.models.swin import SwinConfig

OUR_CFG = GroundingDinoConfig(
    swin=SwinConfig(embed_dim=8, depths=(1, 1, 2), num_heads=(1, 2, 4), window_size=4, out_stages=(1, 2)),
    text=BertConfig(vocab_size=2000, hidden_size=24, num_layers=1, num_heads=2, intermediate=48, max_position=64),
    d_model=32, num_feature_levels=3, encoder_layers=1, decoder_layers=2,
    encoder_heads=4, decoder_heads=4, encoder_ffn=64, decoder_ffn=64,
    num_queries=12, max_text_len=16,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import (
        BertConfig as HFBertConfig,
        GroundingDinoConfig as HFGDConfig,
        GroundingDinoForObjectDetection,
        SwinConfig as HFSwinConfig,
    )

    torch.manual_seed(0)
    swin = HFSwinConfig(
        image_size=64, patch_size=4, embed_dim=8, depths=[1, 1, 2], num_heads=[1, 2, 4],
        window_size=4, out_features=["stage2", "stage3"], drop_path_rate=0.0,
    )
    text = HFBertConfig(
        vocab_size=2000, hidden_size=24, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=48, max_position_embeddings=64, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg = HFGDConfig(
        backbone_config=swin, text_config=text, d_model=32, num_feature_levels=3,
        encoder_layers=1, decoder_layers=2, encoder_attention_heads=4,
        decoder_attention_heads=4, encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_queries=12, max_text_len=16, dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0, fusion_droppath=0.0, fusion_dropout=0.0,
        text_enhancer_dropout=0.0, disable_custom_kernels=True,
    )
    model = GroundingDinoForObjectDetection(cfg).eval()
    params = grounding_dino_from_hf(
        model.state_dict(), swin_depths=[1, 1, 2], swin_out_stages=[1, 2],
        text_layers=1, encoder_layers=1, decoder_layers=2, num_levels=3,
    )
    return model, params


def test_end_to_end_parity(hf_pair):
    model, params = hf_pair
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32) * 0.3
    ids = np.array([[101, 55, 66, 1012, 102, 0]])
    attn = np.array([[1, 1, 1, 1, 1, 0]])
    with torch.no_grad():
        ref = model(
            pixel_values=torch.tensor(img), input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(attn),
        )
    sa, pos = text_token_masks(ids)
    pad = attn == 0
    logits, boxes = GroundingDino(OUR_CFG).apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(ids), jnp.asarray(sa),
        jnp.asarray(pos), jnp.asarray(pad),
    )
    ref_logits = ref.logits.numpy()
    ref_boxes = ref.pred_boxes.numpy()
    ours_logits = np.asarray(logits)
    finite = np.isfinite(ref_logits)
    assert (finite == np.isfinite(ours_logits)).all()
    np.testing.assert_allclose(ours_logits[finite], ref_logits[finite], atol=5e-3)
    np.testing.assert_allclose(np.asarray(boxes), ref_boxes, atol=5e-3)
