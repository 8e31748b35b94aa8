"""Model-level configurations (parity surface: ``src/configs/mmt.py``)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from mmt_tpu.configs.base import Config
from mmt_tpu.configs.encoder import EncoderConfig


@dataclasses.dataclass
class ClsHeadConfig(Config):
    """Classification head (parity: ``src/configs/mmt.py:25-31``)."""

    inner_dim: int = 0
    num_classes: int = 2
    activation: Optional[str] = "tanh"
    dropout_rate: float = 0.0
    cls_token_idx: int = 0
    name: Optional[str] = None


@dataclasses.dataclass
class PretrainModelConfig(Config):
    """Pretraining model (parity: ``src/configs/mmt.py:35-42``)."""

    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    mlm_activation: str = "gelu"
    mlm_initializer: str = "glorot_uniform"
    mpp_activation: str = "gelu"
    mpp_initializer: str = "glorot_uniform"
    cls_heads: List[ClsHeadConfig] = dataclasses.field(default_factory=list)
    bind_word_embedding_table: bool = True


@dataclasses.dataclass
class ClassificationModelConfig(Config):
    """Classification model (parity: ``src/configs/mmt.py:46-50``)."""

    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    num_classes: int = 0
    cls_heads: List[ClsHeadConfig] = dataclasses.field(default_factory=list)
