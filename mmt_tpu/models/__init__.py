"""Flax model family: encoder, heads, pretraining/classification models."""

from mmt_tpu.models.embeddings import EmbeddingLookup  # noqa: F401
from mmt_tpu.models.relative_attention import (  # noqa: F401
    RelativeAttention,
    RelativeTransformerLayer,
    RelativeTransformerLayers,
)
from mmt_tpu.models.encoder import MmtEncoder  # noqa: F401
from mmt_tpu.models.heads import MaskedLMHead, MaskedPPHead, ClassificationHead  # noqa: F401
from mmt_tpu.models.pretraining_model import MmtPretrainingModel  # noqa: F401
from mmt_tpu.models.classification_model import MmtClassificationModel  # noqa: F401
