"""Numeric parity: Pallas fused attention vs dense XLA reference.

The kernel regenerates relative ids in-kernel from the static geometry;
the dense reference consumes the id map materialized by the feature
generators -- so these tests also pin the two id derivations together.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _real_mask(lengths, S):
    """[B, S, 1, 1] mask of real rows.

    Pad-row outputs are intentionally unspecified since the kernel skips
    pad x pad tiles (see _tile_contributes): every framework consumer
    reads real positions only, so parity is asserted on those.
    """
    pos = np.arange(S)
    m = pos[None, :] < np.asarray(lengths)[:, None]
    return m.astype(np.float32)[:, :, None, None]


def _check(geo, B, S, H, D, V, lengths, block=128, seed=0, atol=2e-5):
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed)
    lengths = jnp.asarray(lengths, jnp.int32)
    ids = _ids_for(geo, S) if geo is not None else None
    want = dense_reference(q, k, v, table if geo else None, ids, lengths)
    got = pallas_relative_attention(
        q, k, v, table if geo else None, geo, lengths,
        block_q=block, block_k=block, interpret=True,
    )
    m = _real_mask(lengths, S)
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(want) * m, atol=atol, rtol=atol
    )


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


@pytest.mark.parametrize("flags", [
    {"MMT_ATTN_BAND": "wide"},
    {"MMT_ATTN_LENMASK": "cond"},
    {"MMT_ATTN_SLIM_STATS": "0"},
    {"MMT_ATTN_PRESCALE": "0"},
    {"MMT_ATTN_BIAS": "mul2"},
    {"MMT_ATTN_IMG": "cond"},
    {"MMT_ATTN_IMG": "fetch1"},  # forced fetch incl. single-tile grids
    # IMGSUB x cond combinations are covered by the dedicated
    # test_image_subtile_* tests (which pin MMT_ATTN_IMG=cond).
    {"MMT_ATTN_BIAS": "hbm", "MMT_ATTN_HBM_DTYPE": "f32"},
    {"MMT_ATTN_BAND": "wide", "MMT_ATTN_LENMASK": "cond",
     "MMT_ATTN_SLIM_STATS": "0"},
])
def test_kernel_variant_flags_parity(monkeypatch, flags):
    """Every kernel schedule flag must stay numerically exact.

    The defaults (narrow mod-128 skew, unconditional length-mask add,
    slim [bq, 1] stats scratch, q-prescale) are covered by the whole
    rest of the suite; this pins the non-default legacy schedules (wide
    roll, cond mask, 128-lane stats, post-scale, mul2 bias chain) --
    all alternative schedules of the same math -- so perf A/Bs can't
    drift semantics."""
    for key, val in flags.items():
        monkeypatch.setenv(key, val)
    geo = RelGeometry(text_max_distance=12, num_patch_per_row=8,
                      num_core_layers=1)
    _check(geo, B=2, S=512, H=2, D=64, V=49, lengths=[512, 300], block=128)
    # 1D geometry exercises the all-far-row edge of the band math.
    geo1d = RelGeometry(text_max_distance=12)
    _check(geo1d, B=2, S=384, H=2, D=32, V=25, lengths=[384, 200], block=128)


@pytest.mark.parametrize("flags", [
    {},
    {"MMT_ATTN_BAND": "wide", "MMT_ATTN_LENMASK": "cond"},
    {"MMT_ATTN_PRESCALE": "0"},
    {"MMT_ATTN_DSV_SCHED": "uncond"},
    {"MMT_ATTN_IMG": "cond"},
])
def test_kernel_variant_flags_gradients(monkeypatch, flags):
    """Backward parity under the variant flags that reach the backward
    recompute path (band schedule, length mask, q-prescale).

    D=64 makes the softmax scale a power of two so the default prescale
    path engages (incl. the dK-already-scaled finalize); all four input
    grads are checked."""
    for key, val in flags.items():
        monkeypatch.setenv(key, val)
    geo = RelGeometry(text_max_distance=5, num_patch_per_row=8,
                      num_core_layers=1)
    B, S, H, D, V = 1, 256, 2, 64, 32
    q, k, v, table = _rand_inputs(B, S, H, D, V)
    lengths = jnp.asarray([200], jnp.int32)
    ids = _ids_for(geo, S)
    m = jnp.asarray(_real_mask(lengths, S))

    def loss_ref(q, k, v, table):
        out = dense_reference(q, k, v, table, ids, lengths)
        return jnp.sum((out * m) ** 2)

    def loss_pallas(q, k, v, table):
        out = pallas_relative_attention(
            q, k, v, table, geo, lengths, block_q=128, block_k=128,
            interpret=True,
        )
        return jnp.sum((out * m) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, table)
    for name, a, b in zip("qkvt", g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3,
            err_msg=f"grad wrt {name}",
        )


@pytest.mark.parametrize("mode", ["mul", "cond"])
def test_image_subtile_forward(monkeypatch, mode):
    """Image-id work on a [128, 128] subtile of [256, 256] tiles
    (sub < tile: the operand-shrunk path, not the degenerate sub == tile
    case the other tests hit).  Subtile modes only exist under the
    in-kernel image path (MMT_ATTN_IMG=cond)."""
    monkeypatch.setenv("MMT_ATTN_IMG", "cond")
    monkeypatch.setenv("MMT_ATTN_IMGSUB", mode)
    geo = RelGeometry(text_max_distance=12, num_patch_per_row=8,
                      num_core_layers=1)
    _check(geo, B=2, S=512, H=2, D=64, V=49, lengths=[512, 300], block=256)


@pytest.mark.parametrize("mode", ["mul", "cond"])
def test_image_subtile_gradients(monkeypatch, mode):
    """Backward parity through the subtile image-dsv path (sub < tile)."""
    monkeypatch.setenv("MMT_ATTN_IMG", "cond")
    monkeypatch.setenv("MMT_ATTN_IMGSUB", mode)
    geo = RelGeometry(text_max_distance=5, num_patch_per_row=8,
                      num_core_layers=1)
    B, S, H, D, V = 1, 512, 2, 64, 85
    assert geo.image_part_id < V  # cross-part bias also in play
    q, k, v, table = _rand_inputs(B, S, H, D, V)
    lengths = jnp.asarray([420], jnp.int32)
    ids = _ids_for(geo, S)
    m = jnp.asarray(_real_mask(lengths, S))

    def loss_ref(q, k, v, table):
        out = dense_reference(q, k, v, table, ids, lengths)
        return jnp.sum((out * m) ** 2)

    def loss_pallas(q, k, v, table):
        out = pallas_relative_attention(
            q, k, v, table, geo, lengths, block_q=256, block_k=256,
            interpret=True,
        )
        return jnp.sum((out * m) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, table)
    for name, a, b in zip("qkvt", g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3,
            err_msg=f"grad wrt {name}",
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
    m = _real_mask(lengths, S)
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(want) * m, atol=2e-5, rtol=2e-5
    )


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
    m = _real_mask(lengths, S)
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(want) * m, atol=2e-5, rtol=2e-5
    )


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
    m = _real_mask(lengths, S)
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(want) * m, atol=3e-5, rtol=3e-5
    )


@pytest.mark.parametrize("mode", ["rect", "list"])
def test_split_schedule_matches_full(monkeypatch, mode):
    """Static far/structured tile split (forced via MMT_ATTN_SPLIT=1):
    output must match the dense reference AND the single-kernel path
    bitwise-closely, including the length-mask and lse edge rows.
    Covers both far-pass implementations (rect grid / tile list)."""
    import mmt_tpu.ops.pallas_attention as pa

    geo = RelGeometry(text_max_distance=3, num_patch_per_row=2, num_core_layers=1)
    B, S, H, D, V = 2, 512, 4, 32, 25
    block = 64
    meta = pa._build_tile_meta(geo, S, block, block)
    assert int((meta[3] != 2).sum()) >= 4  # split-eligible

    q, k, v, table = _rand_inputs(B, S, H, D, V, seed=3)
    lengths = jnp.asarray([384, 512], jnp.int32)
    ids = _ids_for(geo, S)
    want = dense_reference(q, k, v, table, ids, lengths)

    monkeypatch.setenv("MMT_ATTN_SPLIT", "1")
    monkeypatch.setenv("MMT_ATTN_SPLIT_MODE", mode)
    got_split = pallas_relative_attention(
        q, k, v, table, geo, lengths, block_q=block, block_k=block,
        interpret=True,
    )
    monkeypatch.setenv("MMT_ATTN_SPLIT", "0")
    got_full = pallas_relative_attention(
        q, k, v, table, geo, lengths, block_q=block, block_k=block,
        interpret=True,
    )
    m = _real_mask(lengths, S)
    np.testing.assert_allclose(np.asarray(got_split) * m, np.asarray(want) * m,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_split) * m,
                               np.asarray(got_full) * m,
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("mode", ["rect", "list"])
def test_split_schedule_1d_all_far_rows(monkeypatch, mode):
    """1D text-only geometry where some qi rows have NO structured tile:
    the structured pass must still emit initialized (o=0, lse=-inf)
    blocks for those rows (sentinel rows) instead of feeding unwritten
    memory into the logsumexp combine."""
    import mmt_tpu.ops.pallas_attention as pa

    geo = RelGeometry(text_max_distance=3)  # 1D: image_len == 0
    B, S, H, D, V = 1, 512, 2, 32, 9
    block = 64
    meta = pa._build_tile_meta(geo, S, block, block)
    far_list, struct_list = pa._split_tile_lists(np.asarray(meta), 8, 8)
    # The far corner rows are all-far => struct sentinel rows exist.
    assert (struct_list[2] == 2).any()

    q, k, v, table = _rand_inputs(B, S, H, D, V, seed=11)
    lengths = jnp.asarray([450], jnp.int32)
    ids = _ids_for(geo, S)
    want = dense_reference(q, k, v, table, ids, lengths)

    monkeypatch.setenv("MMT_ATTN_SPLIT", "1")
    monkeypatch.setenv("MMT_ATTN_SPLIT_MODE", mode)
    got = pallas_relative_attention(
        q, k, v, table, geo, lengths, block_q=block, block_k=block,
        interpret=True,
    )
    m = _real_mask(lengths, S)
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               atol=2e-5, rtol=2e-5)


def test_split_schedule_gradients(monkeypatch):
    """Gradients flow through the split forward via the shared custom
    VJP (the backward recomputes from the combined lse)."""
    import mmt_tpu.ops.pallas_attention as pa

    geo = RelGeometry(text_max_distance=3, num_patch_per_row=2, num_core_layers=1)
    B, S, H, D, V = 1, 256, 2, 16, 25
    block = 64
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed=4)
    lengths = jnp.asarray([200], jnp.int32)

    m = jnp.asarray(_real_mask(lengths, S))

    def loss(q, k, v, table, lengths):
        out = pallas_relative_attention(
            q, k, v, table, geo, lengths, block_q=block, block_k=block,
            interpret=True,
        )
        return jnp.sum((out.astype(jnp.float32) * m) ** 2)

    monkeypatch.setenv("MMT_ATTN_SPLIT", "1")
    g_split = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, table, lengths)
    monkeypatch.setenv("MMT_ATTN_SPLIT", "0")
    g_full = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, table, lengths)
    for a, b in zip(g_split, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_imgfetch_forced_single_tile(monkeypatch):
    """MMT_ATTN_IMG=fetch1 forces the corner fetch on a single-tile grid
    (nq = nk = 1, where no zeros slot exists and the add is truly
    unconditional) -- probe-only mode, must stay exact."""
    monkeypatch.setenv("MMT_ATTN_IMG", "fetch1")
    geo = RelGeometry(text_max_distance=12, num_patch_per_row=14,
                      num_core_layers=1)
    _check(geo, B=2, S=256, H=2, D=32, V=49, lengths=[256, 211], block=256)
