"""Text processing: BERT-compatible WordPiece tokenization + trimming."""

from mmt_tpu.text.wordpiece import BasicTokenizer, WordpieceTokenizer, BertTokenizer, load_vocab  # noqa: F401
from mmt_tpu.text.trimmer import round_robin_trim  # noqa: F401
