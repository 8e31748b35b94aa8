"""Sequence sharding: long-context scaling over the mesh 'model' axis.

The reference's "long" capability is architectural only (relative
attention over one packed sequence; no distribution -- SURVEY section 5).
For beyond-HBM sequence lengths this module adds the TPU-idiomatic
extension: activations sharded over ('data', 'model') = (batch, sequence),
with XLA/GSPMD inserting the K/V all-gathers for the attention
contractions over ICI (the scaling-book recipe: annotate shardings, let
the compiler place collectives).

Usage: shard the token-indexed inputs with ``sequence_sharding(mesh)``
and constrain activations via ``constrain_tokens``; the dense (XLA)
attention path partitions automatically.  The fused Pallas kernel also
runs sequence-sharded via ``ops.pallas_attention``'s shard_map wrappers:
``sequence_sharded_pallas_attention`` (one K/V all-gather) and
``ring_sequence_sharded_pallas_attention`` (ppermute ring, O(S/n) K/V
residency), both differentiable.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """[B, S, ...] arrays: batch over 'data', sequence over 'model'."""
    return NamedSharding(mesh, P("data", "model"))


def constrain_tokens(x, mesh: Optional[Mesh]):
    """Constrains a [B, S, ...] activation to (data, model) sharding."""
    if mesh is None or mesh.shape.get("model", 1) == 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", "model"))
    )


def shard_token_batch(mesh: Mesh, batch: dict) -> dict:
    """Places a host batch: [B,S]/[B,S,...] token arrays over (data, model),
    everything else over data only."""
    seq = sequence_sharding(mesh)
    data = NamedSharding(mesh, P("data"))

    def place(key, x):
        if x.ndim >= 2 and key in ("word_ids", "segment_ids"):
            return jax.device_put(x, seq)
        return jax.device_put(x, data)

    return {k: place(k, v) for k, v in batch.items()}
