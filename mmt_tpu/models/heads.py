"""Task heads: MaskedLM (tied table), MaskedPP, ClassificationHead.

Parity surfaces:
* MaskedLM: TFM ``official.nlp...layers.MaskedLM`` as used by
  ``src/modeling/models/mmt_pretraining_model.py:78-96`` -- gather masked
  positions, dense(embedding_width)+activation, LayerNorm, logits =
  x @ embedding_table^T + output bias.
* MaskedPP: ``src/modeling/layers/masked_patch_prediction_layer.py``
  -- gather, LayerNorm, Dense(num_classes, activation) [sic: the
  reference applies the configured activation (gelu) to the class
  projection], plus an extra output bias.
* ClassificationHead: TFM ``layers.ClassificationHead`` as configured by
  ``ClsHeadConfig`` (``src/configs/mmt.py:25-31``): cls-token slice,
  dense(inner_dim, tanh), dropout, dense(num_classes).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from mmt_tpu.ops.relative_attention_ref import gather_indexes


def _activation(name: Optional[str]) -> Callable:
    if name is None or name == "linear":
        return lambda x: x
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=True)
    return getattr(nn, name)


class MaskedLMHead(nn.Module):
    """MLM head with a tied (or caller-provided) embedding table."""

    embedding_size: int
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sequence, positions, embedding_table):
        """sequence [B,S,H], positions [B,M], table [vocab, emb] -> [B,M,vocab]."""
        x = gather_indexes(sequence, positions)
        x = nn.Dense(
            self.embedding_size,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            name="transform_dense",
        )(x)
        x = _activation(self.activation)(x)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="transform_layer_norm")(x)
        vocab_size = embedding_table.shape[0]
        bias = self.param("output_bias", nn.initializers.zeros, (vocab_size,), jnp.float32)
        logits = (
            jnp.einsum(
                "bmh,vh->bmv",
                x.astype(self.dtype),
                embedding_table.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + bias
        )
        return logits


class MaskedPPHead(nn.Module):
    """Masked patch prediction head -> [B, M, num_classes] logits."""

    num_classes: int
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sequence, positions):
        x = gather_indexes(sequence, positions)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="transform_layer_norm")(x)
        # Faithful quirk: the reference's Dense applies the configured
        # activation (gelu) to the class projection, then adds an extra
        # output bias (masked_patch_prediction_layer.py:60-92).
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            name="transform_dense",
        )(x.astype(self.dtype))
        x = _activation(self.activation)(x)
        bias = self.param(
            "output_bias", nn.initializers.zeros, (self.num_classes,), jnp.float32
        )
        return x.astype(jnp.float32) + bias


class ClassificationHead(nn.Module):
    """Cls-token classification head -> [B, num_classes] logits."""

    inner_dim: int
    num_classes: int
    activation: str = "tanh"
    dropout_rate: float = 0.0
    cls_token_idx: int = 0
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sequence, deterministic: bool = True):
        x = sequence[:, self.cls_token_idx]
        if self.inner_dim:
            x = nn.Dense(
                self.inner_dim,
                kernel_init=nn.initializers.truncated_normal(
                    stddev=self.initializer_range
                ),
                dtype=self.dtype,
                name="pooler_dense",
            )(x)
            x = _activation(self.activation)(x)
        x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.truncated_normal(stddev=self.initializer_range),
            dtype=self.dtype,
            name="out_proj",
        )(x)
        return x.astype(jnp.float32)
