"""CLIP BPE tokenizer tests (no pretrained files needed)."""
import numpy as np

from diffmining_tpu.models.tokenizer import CLIPTokenizer, bytes_to_unicode, tiny_tokenizer


def test_tiny_tokenizer_shape_and_specials():
    tok = tiny_tokenizer()
    out = tok(["A car from the 1980s.", "hi"])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.bos_token_id
    assert tok.eos_token_id in out[0]
    # padding is eos (CLIP pads with eos, reference compute.py:37 semantics)
    assert out[1, -1] == tok.eos_token_id


def test_lowercase_and_whitespace():
    tok = tiny_tokenizer()
    a, b = tok(["A   Car"]), tok(["a car"])
    np.testing.assert_array_equal(a, b)


def test_truncation():
    tok = tiny_tokenizer()
    out = tok(["x " * 500])
    assert out.shape == (1, 77)
    assert out[0, -1] == tok.eos_token_id


def test_bpe_merges_apply():
    """With a merge for (h, e</w>) the word 'he' becomes one token."""
    b2u = bytes_to_unicode()
    h, e = b2u[ord("h")], b2u[ord("e")]
    vocab = {c: i for i, c in enumerate(b2u.values())}
    for c in list(b2u.values()):
        vocab[c + "</w>"] = len(vocab)
    vocab[h + e + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    tok = CLIPTokenizer(vocab, merges=[(h, e + "</w>")])
    ids = tok(["he"])[0]
    # bos, merged token, eos
    assert ids[1] == vocab[h + e + "</w>"]
    assert ids[2] == tok.eos_token_id


def test_decode_roundtrip_words():
    tok = tiny_tokenizer()
    ids = tok(["hello world"])[0]
    assert tok.decode(ids).replace("<|startoftext|>", "").replace("<|endoftext|>", "").strip() == "hello world"
