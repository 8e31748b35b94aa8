"""Numeric parity: Pallas fused attention vs dense XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from mmt_tpu.features.relative_position import MmtRelativePositionGenerator
from mmt_tpu.ops.pallas_attention import pallas_relative_attention
from mmt_tpu.ops.relative_attention_ref import relative_attention_scores

NEG_INF = -10000.0


def dense_reference(q, k, v, rel_table, ids, lengths):
    logits = relative_attention_scores(q, k, rel_table, ids)
    S = q.shape[1]
    pos = jnp.arange(S)
    real = pos[None, :] < lengths[:, None]  # [B, S]
    mask = (real[:, :, None] == real[:, None, :]).astype(jnp.float32)
    logits = logits + (1.0 - mask[:, None]) * NEG_INF
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _rand_inputs(B=2, S=256, H=4, D=32, V=21, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(V, H, D)), jnp.float32)
    return q, k, v, table


def test_pallas_matches_dense_with_2d_ids():
    B, S, H, D = 2, 256, 4, 32
    gen = MmtRelativePositionGenerator(14, 1, 12)  # shipped 2D config
    ids = jnp.asarray(gen.make_relative_att_ids(S, 1)[0])
    V = 49  # shipped vocab: part ids 229/230 are OOV -> zero bias
    q, k, v, table = _rand_inputs(B, S, H, D, V)
    lengths = jnp.array([256, 211], jnp.int32)

    want = dense_reference(q, k, v, table, ids, lengths)
    got = pallas_relative_attention(
        q, k, v, table, ids, lengths, block_q=128, block_k=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_pallas_matches_dense_no_rel():
    B, S, H, D = 1, 128, 2, 64
    q, k, v, _ = _rand_inputs(B, S, H, D)
    lengths = jnp.array([100], jnp.int32)
    want = dense_reference(q, k, v, None, None, lengths)
    got = pallas_relative_attention(
        q, k, v, None, None, lengths, block_q=64, block_k=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_pallas_bf16_close_to_fp32():
    B, S, H, D = 1, 128, 2, 32
    q, k, v, table = _rand_inputs(B, S, H, D, V=13)
    gen = MmtRelativePositionGenerator(8, 1, 12)
    ids = jnp.asarray(gen.make_relative_att_ids(S, 1)[0])
    lengths = jnp.array([128], jnp.int32)
    want = dense_reference(q, k, v, table, ids, lengths)
    got = pallas_relative_attention(
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        table,
        ids,
        lengths,
        block_q=64,
        block_k=64,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.05, rtol=0.05
    )
