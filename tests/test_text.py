"""Tokenizer + trimmer tests, cross-checked against HuggingFace BERT."""

import numpy as np
import pytest

from mmt_tpu.text import BertTokenizer, round_robin_trim

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[ATT]", "[REF]", "[PATCH]",
    "the", "quick", "brown", "fox", "jump", "##ed", "##s", "over", "lazy",
    "dog", "un", "##aff", "##able", "hello", "world", "!", ",", "a",
    "[unused99]", "[unused100]",
]


@pytest.fixture
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


class TestWordpiece:
    def test_basic(self, vocab_file):
        tok = BertTokenizer(vocab_file)
        words = tok.tokenize("The quick brown fox jumped!")
        flat = [VOCAB[i] for w in words for i in w]
        assert flat == ["the", "quick", "brown", "fox", "jump", "##ed", "!"]
        # Word alignment: "jumped" is one word of two pieces.
        assert [len(w) for w in words] == [1, 1, 1, 1, 2, 1]

    def test_unk_and_specials_preserved(self, vocab_file):
        tok = BertTokenizer(vocab_file)
        words = tok.tokenize("zzz [CLS] [unused99] unaffable")
        flat = [VOCAB[i] for w in words for i in w]
        assert flat == ["[UNK]", "[CLS]", "[unused99]", "un", "##aff", "##able"]

    def test_matches_huggingface_bert(self, tmp_path):
        """Algorithm cross-check vs HuggingFace's BertTokenizer built
        from a local vocab (works in the zero-egress environment; the
        WordPiece algorithm, not the released vocab, is what's pinned).
        """
        transformers = pytest.importorskip("transformers")
        vocab = VOCAB + [
            "multi", "##modal", "transform", "##er", "##res", "encode",
            "image", "text", "and", "caps", "12", "##34", "56", ".", "78",
            "9", "##,", "000", "naive", "cafe", "resume", "&", "...",
            "spacing", "weird", "s", "##pace",
        ]
        p = tmp_path / "hf_vocab.txt"
        p.write_text("\n".join(vocab) + "\n")
        hf = transformers.BertTokenizer(
            str(p), do_lower_case=True, do_basic_tokenize=True
        )
        ours = BertTokenizer(str(p))
        for text in [
            "The quick brown fox jumps over the lazy dog!",
            "Multimodal transformers encode images & text, efficiently.",
            "weird   spacing\tand CAPS and punctuation...",
            "naïve café résumé",
            "1234 56.78 9,000",
            "unaffable hello, world!",
        ]:
            got = [t for w in ours.tokenize(text) for t in w]
            want = hf.convert_tokens_to_ids(hf.tokenize(text))
            assert got == want, (text, got, want)


class TestTrimmer:
    """Goldens for tensorflow_text.RoundRobinTrimmer semantics
    (src/data/data_utils.py:121, 256-267): the budget is allocated one
    *wordpiece* per field per round (left-to-right partial rounds) and
    truncation happens on the innermost ragged axis, splitting words."""

    def test_round_robin_element_level(self):
        f1 = [[1, 2], [3], [4, 5, 6]]  # 6 wordpieces
        f2 = [[7], [8, 9]]  # 3 wordpieces
        out = round_robin_trim([f1, f2], 5)
        # Unit rounds: (f1,f2)x3 -> budgets f1=3, f2=2.
        assert out[0] == [[1, 2], [3]]
        assert out[1] == [[7], [8]]  # second word split mid-way

    def test_partial_round_prefers_earlier_fields(self):
        f1 = [[1], [2], [3]]
        f2 = [[4], [5], [6]]
        out = round_robin_trim([f1, f2], 3)
        # Rounds: f1+1, f2+1, f1+1 (budget gone) -> f1=2, f2=1.
        assert out[0] == [[1], [2]]
        assert out[1] == [[4]]

    def test_exhausted_field_cedes_budget(self):
        f1 = [[1, 2, 3, 4]]  # 4 wp
        f2 = [[5]]  # 1 wp
        out = round_robin_trim([f1, f2], 4)
        # f2 exhausts after round 1; f1 absorbs the rest: f1=3, f2=1.
        assert out[0] == [[1, 2, 3]]  # word split after 3 pieces
        assert out[1] == [[5]]

    def test_mid_word_split_single_field(self):
        out = round_robin_trim([[[1, 2], [3, 4, 5]]], 3)
        assert out == [[[1, 2], [3]]]

    def test_no_budget(self):
        out = round_robin_trim([[[1]], [[2]]], 0)
        assert out == [[], []]

    def test_fits_entirely(self):
        f1 = [[1], [2]]
        out = round_robin_trim([f1], 10)
        assert out == [f1]
