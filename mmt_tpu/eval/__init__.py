"""Evaluation: batched retrieval prediction, Recall@K, host metrics."""

from mmt_tpu.eval.recall import get_recall_at_k_from_dataframe  # noqa: F401
from mmt_tpu.eval.predict import RawResult, predict, write_results  # noqa: F401
