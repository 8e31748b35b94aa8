"""Embedding lookup with optional factorized projection and one-hot mode.

Re-provides ``etcmodel.layers.EmbeddingLookup`` capability (call sites:
reference ``src/modeling/models/mmt_encoder.py:90-111``): a
``[vocab, embedding_size]`` table, optional Dense projection to
``projection_size`` (ALBERT-style factorization), and a one-hot-matmul
lookup mode.  On TPU the one-hot mode turns small-vocab lookups into an
MXU matmul and gives the load-bearing semantic that **out-of-vocabulary
ids produce a zero embedding** (the relative-attention layers rely on
this for part-padding ids that overflow the configured relative vocab).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class EmbeddingLookup(nn.Module):
    vocab_size: int
    embedding_size: int
    projection_size: Optional[int] = None
    initializer_range: float = 0.02
    use_one_hot_lookup: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embedding_table",
            nn.initializers.truncated_normal(stddev=self.initializer_range),
            (self.vocab_size, self.embedding_size),
            jnp.float32,
        )
        table = table.astype(self.dtype)
        if self.use_one_hot_lookup:
            # OOV ids -> all-zero one-hot row -> zero embedding.
            one_hot = jnp.asarray(
                nn.one_hot(ids, self.vocab_size, dtype=self.dtype)
            )
            out = jnp.einsum(
                "...v,vd->...d", one_hot, table, preferred_element_type=self.dtype
            )
        else:
            # clip mode: OOB ids clamp to the last row (TPU gather
            # semantics) instead of producing NaN fill values.
            out = jnp.take(table, ids, axis=0, mode="clip")
        if self.projection_size is not None and self.projection_size != self.embedding_size:
            out = nn.Dense(
                self.projection_size,
                kernel_init=nn.initializers.truncated_normal(
                    stddev=self.initializer_range
                ),
                dtype=self.dtype,
                name="embedding_projection",
            )(out)
        return out
