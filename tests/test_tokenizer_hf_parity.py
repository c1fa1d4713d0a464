"""Tokenizer parity vs the REAL HF CLIPTokenizer implementation.

The reference conditions through transformers' CLIPTokenizer
(/root/reference/ldm/modules/encoders/modules.py:141-156). The released
48894-merge vocab is unobtainable here (zero egress), but the *algorithm*
can be pitted against HF's on a synthetic vocab written in HF's own on-disk
format (vocab.json + merges.txt with the `#version` header line that HF
unconditionally drops, tokenization_clip.py). Any divergence in the regex
pre-split, byte-level BPE loop, </w> handling, merge-rank tie-breaking,
truncation, or EOS padding shows up as an id mismatch.

Caveat: ftfy is absent in both this sandbox and HF's fallback path, so HF
substitutes BasicTokenizer text cleanup for ftfy.fix_text. Prompts here
avoid the only inputs where those differ (mojibake, html entities); the
openai-style double html.unescape our tokenizer applies is covered by its
own test below.
"""

import json

import numpy as np
import pytest

from upgpt_tpu.data.tokenizer import CLIPTokenizer, bytes_to_unicode

transformers = pytest.importorskip("transformers")


def _build_merges():
    """A merges table with realistic structure: chained merges, </w>-bearing
    merges, cross-rank competition inside one word, punctuation merges."""
    merges = [
        # chains: t+h -> th, th+e</w> -> the</w>
        ("t", "h"), ("th", "e</w>"), ("i", "n"), ("in", "g</w>"),
        ("a", "n"), ("an", "d</w>"), ("o", "u"), ("r", "e</w>"),
        ("e", "r"), ("er", "s</w>"), ("s", "h"), ("sh", "i"),
        ("shi", "r"), ("shir", "t</w>"), ("d", "r"), ("dr", "e"),
        ("dre", "ss</w>"), ("s", "s</w>"), ("w", "o"), ("wo", "m"),
        ("wom", "an</w>"), ("m", "an</w>"), ("j", "a"), ("ja", "c"),
        ("jac", "k"), ("jack", "e"), ("jacke", "t</w>"), ("e", "t</w>"),
        # punctuation / byte-level merges
        (",", "</w>"), (".", "</w>"), ("!", "!"), ("!!", "!</w>"),
        ("'", "s</w>"), ("1", "</w>"), ("2", "</w>"),
        # competing ranks: 'ou' (rank 6) vs 'u'+'t</w>'
        ("u", "t</w>"), ("o", "n</w>"), ("l", "o"), ("lo", "n"),
        ("lon", "g</w>"), ("b", "l"), ("bl", "u"), ("blu", "e</w>"),
        ("r", "ed</w>"), ("e", "d</w>"), ("c", "o"), ("co", "a"),
        ("coa", "t</w>"), ("h", "a"), ("ha", "t</w>"),
    ]
    # dedupe while keeping order (HF keyerrors on duplicate vocab entries)
    seen, out = set(), []
    for m in merges:
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


def _write_hf_files(tmp_path, merges):
    """vocab.json + merges.txt exactly as shipped on the HF hub."""
    byte_vocab = list(bytes_to_unicode().values())
    vocab = byte_vocab + [v + "</w>" for v in byte_vocab]
    vocab += ["".join(m) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    vocab_file = tmp_path / "vocab.json"
    vocab_file.write_text(
        json.dumps({tok: i for i, tok in enumerate(vocab)}), encoding="utf-8"
    )
    merges_file = tmp_path / "merges.txt"
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n",
        encoding="utf-8",
    )
    return str(vocab_file), str(merges_file)


PROMPTS = [
    "a woman in a red dress",
    "the long blue coat and hat",
    "man's shirt, jacket!!!",
    "SHIRT and Dress",
    "  jacket \t\n dress  ",
    "a_woman_in_a_hat",          # underscores are punctuation to CLIP
    "12 shirts... 21 hats",
    "dress.dress,dress",
    "unmergeable zxqv tokens",
    "ers ing ed s",
    "café über shirt",  # non-ascii bytes -> byte-level BPE
    "!!!",
    "'s 're 'll",
    "",
]


def test_ids_match_hf_clip_tokenizer(tmp_path):
    merges = _build_merges()
    vocab_file, merges_file = _write_hf_files(tmp_path, merges)

    from transformers import CLIPTokenizer as HFTok

    hf = HFTok(vocab_file, merges_file)
    ours = CLIPTokenizer(merges=merges, max_length=77)

    # same id space by construction
    assert ours.encoder == json.loads(open(vocab_file).read())

    for prompt in PROMPTS:
        want = hf(
            [prompt], truncation=True, max_length=77, padding="max_length",
            return_tensors="np",
        )["input_ids"][0]
        got = ours([prompt])[0]
        np.testing.assert_array_equal(
            got, want.astype(np.int32), err_msg=f"prompt={prompt!r}"
        )


def test_merges_txt_loader_matches_inline(tmp_path):
    """_load_merges on the HF on-disk format reproduces the inline table."""
    merges = _build_merges()
    _, merges_file = _write_hf_files(tmp_path, merges)
    from_file = CLIPTokenizer(bpe_path=merges_file, max_length=77)
    inline = CLIPTokenizer(merges=merges, max_length=77)
    assert from_file.encoder == inline.encoder
    assert from_file(["the red dress"]).tolist() == \
        inline(["the red dress"]).tolist()


def test_truncation_matches_hf(tmp_path):
    merges = _build_merges()
    vocab_file, merges_file = _write_hf_files(tmp_path, merges)
    from transformers import CLIPTokenizer as HFTok

    hf = HFTok(vocab_file, merges_file)
    ours = CLIPTokenizer(merges=merges, max_length=8)
    prompt = "the woman and the man and the dress and the shirt"
    want = hf([prompt], truncation=True, max_length=8,
              padding="max_length", return_tensors="np")["input_ids"][0]
    np.testing.assert_array_equal(ours([prompt])[0], want.astype(np.int32))


def test_html_unescape_is_openai_contract():
    """Our cleanup keeps openai/ftfy's double html.unescape (clip
    simple_tokenizer basic_clean); HF's no-ftfy fallback lacks it, so it is
    asserted directly rather than via HF."""
    merges = _build_merges()
    tok = CLIPTokenizer(merges=merges, max_length=77)
    assert tok.encode("&amp;amp;") == tok.encode("&")
