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

    def test_matches_huggingface_bert(self):
        transformers = pytest.importorskip("transformers")
        try:
            hf = transformers.BertTokenizer.from_pretrained(
                "bert-base-uncased", local_files_only=True
            )
        except Exception:
            pytest.skip("no cached bert-base-uncased (zero-egress environment)")
        ours = BertTokenizer(hf.vocab)
        for text in [
            "The quick brown fox jumps over the lazy dog!",
            "Multimodal transformers encode images & text, efficiently.",
            "weird   spacing\tand CAPS and punctuation...",
            "naïve café résumé",
            "1234 56.78 9,000",
        ]:
            got = [t for w in ours.tokenize(text) for t in w]
            want = hf.convert_tokens_to_ids(hf.tokenize(text))
            assert got == want, (text, got, want)


class TestTrimmer:
    def test_round_robin(self):
        f1 = [[1, 2], [3], [4, 5, 6]]  # words of 2,1,3 wp
        f2 = [[7], [8, 9]]
        out = round_robin_trim([f1, f2], 5)
        # Round 1: f1 word0 (2wp, rem 3), f2 word0 (1wp, rem 2);
        # Round 2: f1 word1 (1wp, rem 1), f2 word1 needs 2 -> stop f2;
        # Round 3: f1 word2 needs 3 -> stop. Total = 2+1+1 = 4 wp.
        assert out[0] == [[1, 2], [3]]
        assert out[1] == [[7]]

    def test_no_budget(self):
        out = round_robin_trim([[[1]], [[2]]], 0)
        assert out == [[], []]

    def test_fits_entirely(self):
        f1 = [[1], [2]]
        out = round_robin_trim([f1], 10)
        assert out == [f1]
