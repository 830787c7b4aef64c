import jax.numpy as jnp
import numpy as np
import pytest
import torch

from freepose_tpu.models.bert import BERT_TEST, Bert
from freepose_tpu.models.convert import bert_from_hf


@pytest.fixture(scope="module")
def hf_bert():
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    cfg = HFBertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=32, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    model = BertModel(cfg, add_pooling_layer=False).eval()
    params = bert_from_hf(model.state_dict(), num_layers=2)
    return model, params


def test_bert_parity(hf_bert):
    model, params = hf_bert
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, size=(2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        ref = model(torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    ours = np.asarray(Bert(BERT_TEST).apply(
        {"params": params}, jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    ))
    # Compare only unmasked positions (masked outputs are unconstrained).
    np.testing.assert_allclose(ours[0], ref[0], atol=3e-4)
    np.testing.assert_allclose(ours[1, :8], ref[1, :8], atol=3e-4)


def test_bert_pairwise_mask(hf_bert):
    model, params = hf_bert
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 100, size=(1, 8))
    # Block-diagonal pairwise mask: two independent sub-sentences.
    pm = np.zeros((1, 8, 8), np.int64)
    pm[0, :4, :4] = 1
    pm[0, 4:, 4:] = 1
    ours = np.asarray(Bert(BERT_TEST).apply(
        {"params": params}, jnp.asarray(ids), attention_mask=jnp.asarray(pm)
    ))
    # Changing tokens in the second block must not affect the first block.
    ids2 = ids.copy()
    ids2[0, 5] = (ids2[0, 5] + 7) % 100
    ours2 = np.asarray(Bert(BERT_TEST).apply(
        {"params": params}, jnp.asarray(ids2), attention_mask=jnp.asarray(pm)
    ))
    np.testing.assert_allclose(ours[0, :4], ours2[0, :4], atol=1e-6)
    assert np.abs(ours[0, 4:] - ours2[0, 4:]).max() > 1e-4
