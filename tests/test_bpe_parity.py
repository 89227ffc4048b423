"""Byte-level BPE parity against HF's RobertaTokenizer.

The RoBERTa text path tokenizes with a from-scratch byte-level BPE
(volta_tpu/data/bpe.py, loads the same vocab.json + merges.txt layout the
reference's pytorch_transformers RobertaTokenizer reads). Token streams
and ids must match HF `transformers.RobertaTokenizer` built from the SAME
files — covering the GPT-2 pre-tokenizer regex (leading-space Ġ tokens,
contractions), merge-rank application order, byte fallback for unseen
unicode, and multi-byte UTF-8 characters."""

import json
import os

import pytest

transformers = pytest.importorskip("transformers")

from volta_tpu.data.bpe import RobertaTokenizer, bytes_to_unicode  # noqa: E402

MERGES = [
    ("l", "o"), ("lo", "w"), ("e", "r"), ("Ġ", "low"), ("Ġlow", "er"),
    ("t", "h"), ("th", "e"), ("Ġ", "the"), ("i", "n"), ("in", "g"),
    ("Ġ", "don"), ("d", "o"), ("do", "n"),
]

CASES = [
    "low lower",
    "the lowest thing",
    "don't stop",            # contraction split by the GPT-2 regex
    "héllo wörld",           # multi-byte UTF-8 -> byte-unicode chars
    "  double  spaces  ",
    "numbers 123, punct!?",
    "newline\nand\ttab",
    "CAPS lowercase",
    "",
    "你好",
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("bpe"))
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for ch in bytes_to_unicode().values():
        vocab.setdefault(ch, len(vocab))
    for a, b in MERGES:
        vocab.setdefault(a + b, len(vocab))
    vocab_file = os.path.join(tmp, "vocab.json")
    with open(vocab_file, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    merges_file = os.path.join(tmp, "merges.txt")
    with open(merges_file, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(f"{a} {b}" for a, b in MERGES) + "\n")
    ours = RobertaTokenizer(vocab_file, merges_file)
    hf = transformers.RobertaTokenizer(vocab_file=vocab_file,
                                       merges_file=merges_file)
    return ours, hf


@pytest.mark.parametrize("text", CASES, ids=range(len(CASES)))
def test_bpe_tokens_and_ids_match_hf(pair, text):
    ours, hf = pair
    our_toks = ours.tokenize(text)
    hf_toks = hf.tokenize(text)
    assert our_toks == hf_toks, (text, our_toks, hf_toks)
    assert ours.convert_tokens_to_ids(our_toks) == \
        hf.convert_tokens_to_ids(hf_toks)
