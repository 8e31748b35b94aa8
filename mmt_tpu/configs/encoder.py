"""Encoder configuration (parity surface: ``src/configs/encoders.py:33-101``)."""

from __future__ import annotations

import dataclasses
from typing import Optional

from mmt_tpu.configs.base import Config


@dataclasses.dataclass
class MmtEncoderConfig(Config):
    """Mmt encoder hyperparameters.

    Field-for-field parity with the reference ``MmtEncoderConfig``
    (``src/configs/encoders.py:33-101``), plus TPU-native additions at the
    bottom (compute dtype, kernel selection, remat) that have no
    reference counterpart.
    """

    vocab_size: int = 30522
    segment_vocab_size: int = 16
    # None => equal to hidden_size (BERT); smaller (e.g. 128) => ALBERT-style
    # factorized embeddings.
    embedding_size: Optional[int] = None
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    # 1D text relative position clipping distance.
    relative_pos_max_distance: int = 12
    # Learned relative-bias vocabulary.  IDs >= relative_vocab_size get a
    # zero bias (one-hot lookup semantics) -- faithful to the reference's
    # shipped 2D configs where part-padding ids overflow the vocab.
    relative_vocab_size: int = 32
    # > 0 => 2D MmtRelativePositionGenerator with this core radius;
    # 0 => 1D ETC ids over the whole sequence.
    relative_att_num_core_layers: int = 0
    max_absolute_position_embeddings: Optional[int] = None
    intermediate_size: int = 3072
    hidden_activation: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    initializer_range: float = 0.02
    use_pre_activation_order: bool = True
    use_one_hot_lookup: bool = True
    use_pooler_layer: bool = False

    # --- TPU-native extensions (no reference counterpart) ---
    # Computation dtype for matmuls/attention ("bfloat16" or "float32").
    # Parameters are always stored float32.
    compute_dtype: str = "bfloat16"
    # Attention implementation: "xla" (einsum + gather) or "pallas"
    # (fused flash-style TPU kernel with in-kernel relative bias).
    attention_impl: str = "xla"
    # Rematerialize each transformer layer (memory for FLOPs trade).
    remat: bool = False
    # Block size for the pallas attention kernel.
    attention_block_q: int = 256  # measured best at 4k (finer q-tiles sharpen the length skip)
    attention_block_k: int = 512
    # Sliding-window + prefix-global attention pattern (0 = dense, the
    # reference behavior).  window > 0: token pair (i, j) attends iff
    # i or j is global or |i - j| <= window.  The BASELINE long-sequence
    # config ("sliding-window + global attention" at 4k): the upstream
    # etcmodel has long sparse attention but the reference instantiates
    # only the dense stack, so this is a TPU-native extension -- the
    # fused kernel skips out-of-window tiles, cost O(S*(window+global)).
    attention_window: int = 0
    # -1 = auto: the image part ([CLS] [PATCH] + patches) is global.
    attention_num_global: int = -1
    # Dense-layer quantization: "none" (default) or "int8_dynamic" --
    # post-training dynamic int8 for the q/k/v/output projections and the
    # FFN (per-channel int8 weights x per-tensor dynamic int8 activations,
    # s32 MXU accumulation; see mmt_tpu/ops/quant.py).  INFERENCE ONLY:
    # the rounding ops have zero gradient, so training configs must keep
    # "none" (enforced at the encoder level when deterministic=False).
    quantize: str = "none"


@dataclasses.dataclass
class EncoderConfig(Config):
    """OneOf-style wrapper (parity: ``src/configs/encoders.py:105-109``)."""

    type: str = "mmt"
    mmt: MmtEncoderConfig = dataclasses.field(default_factory=MmtEncoderConfig)
    # Dotted import path ("pkg.mod.Class" or "pkg.mod:Class") of a custom
    # encoder flax Module -- the analog of the reference's gin-injectable
    # ``encoder_cls`` bypass (``src/configs/encoders.py:112-158``).  When
    # set, ``build_encoder`` instantiates it as
    # ``cls(config=<MmtEncoderConfig>, num_patch_per_row=..., name=...)``
    # instead of ``MmtEncoder``; the class must accept that signature and
    # return the encoder output dict (``sequence_output`` [+
    # ``pooled_output``]).  Configured through the ordinary yaml /
    # params_override surface, so no separate gin mechanism is needed.
    encoder_cls: str = ""

    def get(self) -> MmtEncoderConfig:
        if self.type != "mmt":
            raise ValueError(f"Only 'mmt' encoders are supported, got {self.type!r}.")
        return self.mmt


def build_encoder(config: EncoderConfig, num_patch_per_row: int,
                  name: str = "encoder", encoder_cls=None):
    """Encoder factory with the ``encoder_cls`` injection point
    (parity surface: ``src/configs/encoders.py:112-158``).

    ``encoder_cls`` can arrive three ways, mirroring the reference's
    gin configurability (it made exactly this parameter gin-bindable):
    as a class passed directly, as a dotted path in the config
    (yaml/params_override), or as a gin-style binding
    ``build_encoder.encoder_cls = @pkg.Encoder`` (utils/bindings.py).
    """
    from mmt_tpu.models.encoder import MmtEncoder  # deferred: avoids cycle

    cls = encoder_cls
    if cls is None and config.encoder_cls:
        from mmt_tpu.utils.bindings import resolve_reference

        cls = resolve_reference(config.encoder_cls)
    if cls is not None:
        return cls(config=config.get(), num_patch_per_row=num_patch_per_row,
                   name=name)
    return MmtEncoder(config.get(), num_patch_per_row=num_patch_per_row,
                      name=name)


# Gin-analog configurability: `build_encoder.encoder_cls = @pkg.Cls`
# binds the parameter exactly as the reference's gin file would
# (src/configs/encoders.py:112 @gin.configurable).
from mmt_tpu.utils.bindings import configurable as _configurable  # noqa: E402

build_encoder = _configurable(build_encoder)
