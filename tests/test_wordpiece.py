import numpy as np

from freepose_tpu.models.wordpiece import WordPieceTokenizer


def _vocab(tmp_path):
    tokens = ["[PAD]"] * 100 + ["[UNK]", "[CLS]", "[SEP]"] + [
        "objects", ".", "a", "photo", "of", "cat", "##s", "un", "##know", "##able",
    ]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(tokens))
    return p


def test_wordpiece_basic(tmp_path):
    tok = WordPieceTokenizer(_vocab(tmp_path))
    ids = tok.encode("Objects.")
    assert ids[0] == tok.cls and ids[-1] == tok.sep
    assert tok.vocab["objects"] in ids and tok.vocab["."] in ids


def test_wordpiece_continuation_and_unk(tmp_path):
    tok = WordPieceTokenizer(_vocab(tmp_path))
    ids = tok.encode("cats unknowable zzz")
    assert tok.vocab["cat"] in ids and tok.vocab["##s"] in ids
    assert tok.vocab["un"] in ids and tok.vocab["##know"] in ids and tok.vocab["##able"] in ids
    assert tok.unk in ids  # zzz not in vocab


def test_wordpiece_matches_hf_when_available(tmp_path):
    try:
        from transformers import BertTokenizer
    except ImportError:
        return
    vocab = _vocab(tmp_path)
    hf = BertTokenizer(str(vocab), do_lower_case=True)
    tok = WordPieceTokenizer(vocab)
    for text in ["a photo of cats.", "Objects. unknowable", "of of of"]:
        ref = hf(text)["input_ids"]
        assert tok.encode(text) == ref, text


def test_batch_padding(tmp_path):
    tok = WordPieceTokenizer(_vocab(tmp_path))
    ids, mask = tok(["objects.", "a photo of cats."])
    assert ids.shape == mask.shape
    assert mask[0].sum() < mask[1].sum()
    assert (ids[0][mask[0] == 0] == 0).all()
