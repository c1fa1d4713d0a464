"""CLIP BPE tokenizer algorithm tests with a synthetic merges table."""

import numpy as np
import pytest

from upgpt_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode


def _tok(max_length=10):
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
              ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>")]
    return CLIPTokenizer(merges=merges, max_length=max_length)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_merged_words_single_token():
    tok = _tok()
    ids = tok.encode("hello world")
    assert len(ids) == 2
    assert tok.decoder[ids[0]] == "hello</w>"
    assert tok.decoder[ids[1]] == "world</w>"


def test_batch_padding_and_bos_eos():
    tok = _tok(max_length=6)
    out = tok(["hello", "hello world hello"])
    assert out.shape == (2, 6) and out.dtype == np.int32
    assert out[0, 0] == tok.bos_id and out[0, 2] == tok.eos_id
    # padding with EOS (HF padding="max_length" contract)
    assert (out[0, 3:] == tok.eos_id).all()
    # truncation keeps BOS/EOS wrapping
    assert out[1, 0] == tok.bos_id and out[1, -1] == tok.eos_id


def test_cleanup_lowercase_whitespace():
    tok = _tok()
    assert tok.encode("  HeLLo\n\tWORLD ") == tok.encode("hello world")


def test_decode_roundtrip():
    tok = _tok()
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"


def test_missing_vocab_file_raises():
    with pytest.raises(FileNotFoundError):
        CLIPTokenizer(bpe_path="/nonexistent/vocab.gz")


def test_underscore_is_punctuation_not_dropped():
    """CLIP's pattern treats '_' as punctuation ([^\\s\\p{L}\\p{N}]+), but
    stdlib \\w includes it — the naive [^\\s\\w]+ class silently dropped
    underscores (round-1 advisor finding)."""
    tok = _tok()
    with_us = tok.encode("hello_world")
    without = tok.encode("helloworld")
    assert with_us != without
    # '_' splits the word like any punctuation would: same pieces as spaces
    # except the underscore token itself sits between them
    spaced = tok.encode("hello world")
    assert [i for i in with_us if tok.decoder[i] not in ("_", "_</w>")] == spaced
