"""Loss functions.

Parity surface:
``src/modeling/losses/weighted_sparse_categorical_crossentropy_loss.py``
and the binary path referenced (but left unimplemented -- a latent crash)
at ``src/tasks/classification.py:113``; implemented here as documented
behavior.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def weighted_sparse_categorical_crossentropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_weights: jnp.ndarray,
    pos_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sum(w * pos_w * CE) / Sum(w), with divide-no-nan semantics.

    Logits are cast to float32 before the softmax CE, matching the
    reference (loss file lines 20-23).
    """
    logits = logits.astype(jnp.float32)
    per_example = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if pos_weights is not None:
        per_example = per_example * pos_weights.astype(per_example.dtype)
    w = label_weights.astype(per_example.dtype)
    numerator = jnp.sum(per_example * w)
    denominator = jnp.sum(w)
    return jnp.where(denominator > 0, numerator / jnp.maximum(denominator, 1e-30), 0.0)


def weighted_binary_crossentropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_weights: jnp.ndarray,
    pos_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sigmoid CE for single-logit heads (fixes the reference's missing impl)."""
    logits = logits.astype(jnp.float32).reshape(labels.shape)
    per_example = optax.sigmoid_binary_cross_entropy(logits, labels.astype(jnp.float32))
    if pos_weights is not None:
        per_example = per_example * pos_weights.astype(per_example.dtype)
    w = label_weights.astype(per_example.dtype)
    numerator = jnp.sum(per_example * w)
    denominator = jnp.sum(w)
    return jnp.where(denominator > 0, numerator / jnp.maximum(denominator, 1e-30), 0.0)
