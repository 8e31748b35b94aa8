"""Compute ops: dense XLA reference paths and Pallas TPU kernels."""

from mmt_tpu.ops.relative_attention_ref import (  # noqa: F401
    relative_attention_scores,
    gather_indexes,
)
from mmt_tpu.ops.pallas_attention import pallas_relative_attention  # noqa: F401
