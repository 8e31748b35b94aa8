"""Native C++ WordPiece vs the Python tokenizer: byte-exact on ASCII,
Python fallback on non-ASCII."""

import numpy as np
import pytest

from mmt_tpu.text.native import NativeBertTokenizer
from mmt_tpu.text.wordpiece import BertTokenizer

VOCAB = {
    "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4,
    "[ATT]": 5, "[REF]": 6, "[unused99]": 7,
    "a": 10, "the": 11, "product": 12, "red": 13, "dress": 14,
    "##s": 15, "##es": 16, "##ing": 17, "run": 18, "runn": 19,
    "photo": 20, "##graph": 21, "##y": 22, ",": 23, ".": 24, "!": 25,
    "-": 26, "'": 27, "2": 28, "##0": 29, "co": 30, "##ol": 31,
}


@pytest.fixture(scope="module")
def pair():
    py = BertTokenizer(VOCAB)
    nat = NativeBertTokenizer(VOCAB)
    if not nat.native_available:
        pytest.skip("native library unavailable")
    return py, nat

TEXTS = [
    "the red dress",
    "a photography product!",
    "runs running, runnes",                      # ##s / ##es / ##ing
    "The RED Dress.",                            # lowercasing
    "un-known-word",                             # punct split + [UNK]
    "[ATT] the red dress [SEP]",                 # preserved specials
    "[unused99] photo",                          # unused token preserved
    "the  red\t dress\n",                        # whitespace cleanup
    "20 co ol cool",                             # digits, subwords
    "a" * 201,                                   # max_chars_per_word -> UNK
    "!!!...,,",                                  # pure punctuation
    "",                                          # empty
    "   ",                                       # only spaces
    "the\x00red\x1fdress",                       # control chars dropped
    "[MASK]s",                                   # bracket token glued: split
    "[UNUSED99] photo",                          # case-variant preserve: the
    "[Att] red [ReF]",                           # post-lowercase re-check
]


def test_ascii_parity(pair):
    py, nat = pair
    for text in TEXTS:
        assert nat.tokenize(text) == py.tokenize(text), text
        assert nat.flat_tokenize(text) == py.flat_tokenize(text), text


def test_random_ascii_parity(pair):
    py, nat = pair
    rng = np.random.default_rng(0)
    chars = list("abcdefgh eyto.!-,'[]RUN the red dress photo 20")
    for _ in range(200):
        n = int(rng.integers(0, 60))
        text = "".join(rng.choice(chars, size=n))
        assert nat.tokenize(text) == py.tokenize(text), repr(text)


def test_non_ascii_falls_back(pair):
    py, nat = pair
    for text in ["crème brûlée", "日本語 text", "naïve the dress", "emoji 🎉"]:
        assert nat.tokenize(text) == py.tokenize(text), text


def test_vocab_file_roundtrip(tmp_path, pair):
    # id = line index contract survives the file form.
    size = max(VOCAB.values()) + 1
    table = [""] * size
    for tok, idx in VOCAB.items():
        table[idx] = tok
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(table) + "\n")
    nat = NativeBertTokenizer(str(path))
    py = BertTokenizer(str(path))
    for text in TEXTS:
        assert nat.tokenize(text) == py.tokenize(text), text
