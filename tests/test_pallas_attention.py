"""Numeric parity: Pallas fused attention vs dense XLA reference.

The kernel regenerates relative ids in-kernel from the static geometry;
the dense reference consumes the id map materialized by the feature
generators -- so these tests also pin the two id derivations together.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mmt_tpu.features.relative_position import (
    MmtRelativePositionGenerator,
    RelativePositionGenerator,
)
from mmt_tpu.ops.pallas_attention import RelGeometry, pallas_relative_attention
from mmt_tpu.ops.relative_attention_ref import relative_attention_scores

NEG_INF = -10000.0


def dense_reference(q, k, v, rel_table, ids, lengths):
    logits = relative_attention_scores(q, k, rel_table, ids)
    S = q.shape[1]
    pos = jnp.arange(S)
    real = pos[None, :] < lengths[:, None]
    mask = (real[:, :, None] == real[:, None, :]).astype(jnp.float32)
    logits = logits + (1.0 - mask[:, None]) * NEG_INF
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _rand_inputs(B, S, H, D, V, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(V, H, D)), jnp.float32)
    return q, k, v, table


def _ids_for(geo: RelGeometry, S: int):
    if geo.num_core_layers > 0:
        gen = MmtRelativePositionGenerator(
            geo.num_patch_per_row, geo.num_core_layers, geo.text_max_distance
        )
    else:
        gen = RelativePositionGenerator(geo.text_max_distance)
    return jnp.asarray(gen.make_relative_att_ids(S, 1)[0])


def _check(geo, B, S, H, D, V, lengths, block=128, seed=0, atol=2e-5):
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed)
    lengths = jnp.asarray(lengths, jnp.int32)
    ids = _ids_for(geo, S) if geo is not None else None
    want = dense_reference(q, k, v, table if geo else None, ids, lengths)
    got = pallas_relative_attention(
        q, k, v, table if geo else None, geo, lengths,
        block_q=block, block_k=block, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol, rtol=atol)


def test_2d_geometry_shipped_config():
    # P=14, r=1, D=12, V=49: part ids 229/230 are OOV -> zero bias.
    geo = RelGeometry(text_max_distance=12, num_patch_per_row=14, num_core_layers=1)
    _check(geo, B=2, S=256, H=2, D=32, V=49, lengths=[256, 211], block=256)


def test_2d_geometry_multi_tile():
    geo = RelGeometry(text_max_distance=5, num_patch_per_row=8, num_core_layers=2)
    _check(geo, B=2, S=512, H=2, D=32, V=32, lengths=[512, 300], block=128)


def test_2d_geometry_parts_in_vocab():
    # Vocab covers image_part/text_part -> learned cross-part bias applies.
    geo = RelGeometry(text_max_distance=3, num_patch_per_row=4, num_core_layers=1)
    assert geo.text_part_id == 4 * 4 + 8 + 7 + 1
    _check(geo, B=1, S=128, H=2, D=16, V=geo.text_part_id + 1, lengths=[100], block=64)


def test_1d_geometry():
    geo = RelGeometry(text_max_distance=12)
    _check(geo, B=2, S=384, H=2, D=32, V=25, lengths=[384, 200], block=128)


def test_no_rel():
    _check(None, B=1, S=128, H=2, D=64, V=1, lengths=[100], block=64)


def test_bf16_close():
    geo = RelGeometry(text_max_distance=12, num_patch_per_row=8, num_core_layers=1)
    B, S, H, D, V = 1, 128, 2, 32, 49
    q, k, v, table = _rand_inputs(B, S, H, D, V)
    lengths = jnp.asarray([128], jnp.int32)
    ids = _ids_for(geo, S)
    want = dense_reference(q, k, v, table, ids, lengths)
    got = pallas_relative_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        table, geo, lengths, block_q=64, block_k=64, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.05, rtol=0.05
    )


def test_sequence_sharded_matches_unsharded():
    """shard_map fused attention (4-way seq shards) == single-device kernel."""
    from mmt_tpu.ops.pallas_attention import sequence_sharded_pallas_attention
    from mmt_tpu.parallel import create_mesh

    geo = RelGeometry(text_max_distance=5, num_patch_per_row=4, num_core_layers=1)
    B, S, H, D, V = 2, 256, 2, 16, 24
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed=11)
    lengths = jnp.asarray([256, 200], jnp.int32)

    want = pallas_relative_attention(
        q, k, v, table, geo, lengths, block_q=64, block_k=64, interpret=True
    )

    mesh = create_mesh(num_data=2, num_model=4)
    with mesh:
        got = jax.jit(
            lambda q, k, v, t, ln: sequence_sharded_pallas_attention(
                q, k, v, t, geo, ln, mesh=mesh, block_q=32, block_k=64,
                interpret=True,
            )
        )(q, k, v, table, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_sequence_sharded_no_rel():
    from mmt_tpu.ops.pallas_attention import sequence_sharded_pallas_attention
    from mmt_tpu.parallel import create_mesh

    B, S, H, D = 2, 128, 2, 16
    q, k, v, _ = _rand_inputs(B, S, H, D, 1, seed=12)
    lengths = jnp.asarray([128, 90], jnp.int32)
    want = pallas_relative_attention(
        q, k, v, None, None, lengths, block_q=32, block_k=32, interpret=True
    )
    mesh = create_mesh(num_data=2, num_model=4)
    with mesh:
        got = jax.jit(
            lambda q, k, v, ln: sequence_sharded_pallas_attention(
                q, k, v, None, None, ln, mesh=mesh, block_q=32,
                block_k=32, interpret=True,
            )
        )(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_ring_sharded_matches_unsharded():
    """Ring-schedule seq sharding (4 chunks) == single-device kernel."""
    from mmt_tpu.ops.pallas_attention import ring_sequence_sharded_pallas_attention
    from mmt_tpu.parallel import create_mesh

    geo = RelGeometry(text_max_distance=5, num_patch_per_row=4, num_core_layers=1)
    B, S, H, D, V = 2, 256, 2, 16, 24
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed=13)
    lengths = jnp.asarray([256, 190], jnp.int32)
    want = pallas_relative_attention(
        q, k, v, table, geo, lengths, block_q=64, block_k=64, interpret=True
    )
    mesh = create_mesh(num_data=2, num_model=4)
    with mesh:
        got = jax.jit(
            lambda q, k, v, t, ln: ring_sequence_sharded_pallas_attention(
                q, k, v, t, geo, ln, mesh=mesh, block_q=32, block_k=32,
                interpret=True,
            )
        )(q, k, v, table, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5)
