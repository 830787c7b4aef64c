import numpy as np
import pytest

from freepose_tpu.models.tokenizer import ClipTokenizer, bytes_to_unicode


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    # Build a miniature merges file in the standard format (version header
    # then one merge per line).
    merges = [
        "t h", "th e</w>", "c a", "ca t</w>", "d o", "do g</w>", "a</w> ",
    ]
    path = tmp_path_factory.mktemp("bpe") / "vocab.txt"
    path.write_text("#version: 0.2\n" + "\n".join(m for m in merges if m.strip()))
    return ClipTokenizer(path, context_length=16)


def test_bytes_to_unicode_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_tokenize_known_merges(tokenizer):
    ids = tokenizer(["the cat"])
    assert ids.shape == (1, 16)
    assert ids[0, 0] == tokenizer.sot
    toks = list(ids[0])
    assert tokenizer.eot in toks
    # "the" merged to a single token via (th, e</w>)
    the_id = tokenizer.encoder["the</w>"]
    cat_id = tokenizer.encoder["cat</w>"]
    assert the_id in toks and cat_id in toks


def test_tokenize_unknown_word_falls_to_chars(tokenizer):
    ids = tokenizer(["zq"])
    toks = [t for t in ids[0] if t not in (0, tokenizer.sot, tokenizer.eot)]
    assert len(toks) == 2  # 'z' + 'q</w>'


def test_cleanup_and_case(tokenizer):
    a = tokenizer(["  The   CAT "])
    b = tokenizer(["the cat"])
    np.testing.assert_array_equal(a, b)


def test_truncation(tokenizer):
    ids = tokenizer(["cat " * 50])
    assert ids.shape == (1, 16)
    assert ids[0, -1] == tokenizer.eot
