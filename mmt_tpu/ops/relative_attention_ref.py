"""Dense XLA reference ops for relative attention and position gathers.

These are the numerically-authoritative implementations the Pallas
kernels are validated against.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def relative_attention_scores(
    q: jnp.ndarray,
    k: jnp.ndarray,
    rel_table: Optional[jnp.ndarray],
    relative_att_ids: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Scaled attention logits with additive relative bias, in float32.

    score(b,h,q,k) = (q.k + q.R[id(q,k), h]) / sqrt(head_dim)

    The bias is computed as a small projection ``qr[b,h,q,v] = q . R[v,h]``
    over the relative vocabulary (v <= ~49) followed by a gather along v --
    never materializing a [S, S, V] one-hot.  Ids >= V produce zero bias
    (one-hot lookup semantics of the reference; see module docstring of
    ``mmt_tpu.models.relative_attention``).

    Args:
      q, k: <float>[B, S, num_heads, head_dim].
      rel_table: <float32>[V, num_heads, head_dim] or None.
      relative_att_ids: <int32>[S, S] or [B, S, S] or None.

    Returns:
      <float32>[B, num_heads, S, S] logits.
    """
    head_dim = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )

    if rel_table is not None and relative_att_ids is not None:
        vocab = rel_table.shape[0]
        qr = jnp.einsum(
            "bqhd,vhd->bhqv", q, rel_table.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )  # [B, H, Q, V]
        ids = relative_att_ids
        if ids.ndim == 2:
            ids = ids[None]
        valid = ids < vocab
        safe_ids = jnp.where(valid, ids, 0)  # [B|1, Q, K]
        gathered = jnp.take_along_axis(
            qr, safe_ids[:, None, :, :], axis=-1
        )  # [B, H, Q, K]
        rel = jnp.where(valid[:, None], gathered, 0.0)
        logits = logits + rel

    return logits / jnp.sqrt(jnp.float32(head_dim))


def gather_indexes(sequence: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """Gathers hidden vectors at ``positions`` per batch row.

    Equivalent capability to the reference's BERT-style flattened gather
    (``src/tensor_utils.py:27-44``), expressed as a batched
    take_along_axis (XLA lowers this to an efficient TPU gather).

    Args:
      sequence: <float>[B, S, H].
      positions: <int32>[B, M].

    Returns:
      <float>[B, M, H].
    """
    return jnp.take_along_axis(sequence, positions[..., None], axis=1)
