"""Tokenizer parity against HuggingFace's BertTokenizer.

The reference tokenizes with pytorch_transformers' BertTokenizer
(reference: train_task.py / volta/datasets/*), whose algorithm HF
`transformers.BertTokenizer` preserves. Our from-scratch implementation
(volta_tpu/data/tokenization.py) must produce identical tokens AND ids on
the hostile parts of the algorithm: wordpiece greedy-longest-match, accent
stripping under lowercasing, CJK spacing, punctuation splitting, control
character removal, and the too-long-token [UNK] fallback.
"""

import os

import pytest

transformers = pytest.importorskip("transformers")

from volta_tpu.data.tokenization import BertTokenizer  # noqa: E402

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "a", "un", "##aff", "##able", "play", "##ing", "##ed",
    "run", "runn", "##er", "##s", "cafe", "hello", "world",
    "can", "'", "t", "stop", "-", "me", ".", "(", ")", "!", ",",
    "你", "好", "世", "界", "2", "##0", "##2", "##4", "won",
]

CASES = [
    "unaffable",
    "playing played plays",
    "The quick runner runs.",
    "can't stop-me. (really)!",
    "héllo café",                      # accents strip under lowercasing
    "HELLO WoRLD",
    "你好世界",                         # CJK chars split to single tokens
    "mixed你好text",
    "2024",
    "won't",
    "   leading and trailing   ",
    "tabs\tand\nnewlines",
    "control\x00chars\x1fhere",        # stripped by _clean_text
    "a" * 150,                         # > max wordpiece chars -> [UNK]
    "unknownword outside vocab",
    "ellipsis... and, commas,,",
    "",
    " nbsp separated",       # unicode whitespace (Zs)
    "zero​width​joined",        # Cf chars removed as control
    "soft­hyphen"
]


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tokparity")
    vocab_file = os.path.join(str(tmp), "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    ours = BertTokenizer(vocab_file, do_lower_case=True)
    hf = transformers.BertTokenizer(vocab_file=vocab_file,
                                    do_lower_case=True)
    return ours, hf


@pytest.mark.parametrize("text", CASES, ids=range(len(CASES)))
def test_tokens_and_ids_match_hf(pair, text):
    ours, hf = pair
    our_toks = ours.tokenize(text)
    hf_toks = hf.tokenize(text)
    assert our_toks == hf_toks, (text, our_toks, hf_toks)
    assert ours.convert_tokens_to_ids(our_toks) == \
        hf.convert_ids_to_tokens.__self__.convert_tokens_to_ids(hf_toks)


def test_cased_mode_matches_hf(tmp_path):
    vocab_file = os.path.join(str(tmp_path), "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    ours = BertTokenizer(vocab_file, do_lower_case=False)
    hf = transformers.BertTokenizer(vocab_file=vocab_file,
                                    do_lower_case=False)
    for text in ("Héllo Café", "The PLAYING field", "你好 WORLD"):
        assert ours.tokenize(text) == hf.tokenize(text), text
