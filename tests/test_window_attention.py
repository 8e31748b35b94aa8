"""Sliding-window + prefix-global attention: kernel parity, gradients,
module/encoder integration.

North-star long-context capability (BASELINE.md: "4k-token long-sequence
sliding-window + global attention config").  The upstream etcmodel has
long sparse attention but the reference instantiates only the dense stack
(`/root/reference/src/modeling/models/mmt_encoder.py:124-135`), so the
oracle here is the dense XLA path with the same pattern mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmt_tpu.ops.pallas_attention import (
    RelGeometry,
    pallas_relative_attention,
)
from tests.test_pallas_attention import (
    NEG_INF,
    _ids_for,
    _rand_inputs,
    _real_mask,
    dense_reference,
)


def dense_window_reference(q, k, v, rel_table, ids, lengths, window, g):
    """Dense oracle: full attention + the window/global pattern mask."""
    from mmt_tpu.ops.relative_attention_ref import relative_attention_scores

    logits = relative_attention_scores(q, k, rel_table, ids)
    S = q.shape[1]
    pos = jnp.arange(S)
    real = pos[None, :] < lengths[:, None]
    mask = (real[:, :, None] == real[:, None, :]).astype(jnp.float32)
    logits = logits + (1.0 - mask[:, None]) * NEG_INF
    i, j = pos[:, None], pos[None, :]
    allowed = (i < g) | (j < g) | (jnp.abs(j - i) <= window)
    logits = logits + jnp.where(allowed, 0.0, NEG_INF)[None, None]
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _check_window(geo, B, S, H, D, V, lengths, block=64, seed=0, atol=2e-5,
                  block_q=None):
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed)
    lengths = jnp.asarray(lengths, jnp.int32)
    ids = _ids_for(geo, S)
    want = dense_window_reference(
        q, k, v, table, ids, lengths, geo.window, geo.num_global)
    got = pallas_relative_attention(
        q, k, v, table, geo, lengths,
        block_q=block_q or block, block_k=block, interpret=True,
    )
    m = _real_mask(lengths, S)
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(want) * m, atol=atol, rtol=atol
    )


def test_window_2d_geometry_multi_tile():
    # g=18 covers [CLS]+[PATCH]+16 patches; window 48 < S=512: many
    # all-text tiles are fully skipped at block 64.
    geo = RelGeometry(text_max_distance=5, num_patch_per_row=4,
                      num_core_layers=1, window=48, num_global=18)
    _check_window(geo, B=2, S=512, H=2, D=32, V=32, lengths=[512, 300])


def test_window_unaligned_boundaries():
    # window/global cut through tile interiors (not multiples of 64).
    geo = RelGeometry(text_max_distance=3, num_patch_per_row=4,
                      num_core_layers=1, window=37, num_global=21)
    _check_window(geo, B=2, S=256, H=2, D=16, V=40, lengths=[256, 150])


def test_window_1d_geometry_rect_blocks():
    geo = RelGeometry(text_max_distance=12, window=64, num_global=16)
    _check_window(geo, B=2, S=384, H=2, D=32, V=25, lengths=[384, 200],
                  block=128, block_q=64)


def test_window_at_least_seq_is_dense():
    # window >= S: bit-identical to the dense kernel.
    geo_w = RelGeometry(text_max_distance=5, num_patch_per_row=4,
                        num_core_layers=1, window=256, num_global=18)
    geo_d = RelGeometry(text_max_distance=5, num_patch_per_row=4,
                        num_core_layers=1)
    q, k, v, table = _rand_inputs(2, 256, 2, 16, 32)
    lengths = jnp.asarray([256, 150], jnp.int32)
    a = pallas_relative_attention(q, k, v, table, geo_w, lengths,
                                  block_q=64, block_k=64, interpret=True)
    b = pallas_relative_attention(q, k, v, table, geo_d, lengths,
                                  block_q=64, block_k=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_window_gradients_match_dense_reference():
    geo = RelGeometry(text_max_distance=5, num_patch_per_row=4,
                      num_core_layers=1, window=48, num_global=18)
    q, k, v, table = _rand_inputs(2, 256, 2, 16, 32, seed=3)
    lengths = jnp.asarray([256, 170], jnp.int32)
    ids = _ids_for(geo, 256)
    m = jnp.asarray(_real_mask(lengths, 256))

    def loss_kernel(q, k, v, table):
        out = pallas_relative_attention(
            q, k, v, table, geo, lengths, block_q=64, block_k=64,
            interpret=True)
        return jnp.sum((out * m) ** 2)

    def loss_ref(q, k, v, table):
        out = dense_window_reference(q, k, v, table, ids, lengths,
                                     geo.window, geo.num_global)
        return jnp.sum((out * m) ** 2)

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, table)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, table)
    for a, b, name in zip(g_kernel, g_ref, "qkvt"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3,
            err_msg=f"grad {name}")


@pytest.mark.parametrize("dropout", [0.0, 0.3])
def test_window_list_grid_matches_rect_grid(monkeypatch, dropout):
    """The list-driven windowed grid (default) is bit-identical to the
    rectangular pl.when-skip grid: the list walks the same live tiles in
    the same qi-major (dq/fwd) / ki-major (dkv) order, so every flash
    accumulation happens in the same order on the same operands."""
    geo = RelGeometry(text_max_distance=5, num_patch_per_row=4,
                      num_core_layers=1, window=48, num_global=18)
    q, k, v, table = _rand_inputs(2, 256, 2, 16, 32, seed=11)
    lengths = jnp.asarray([256, 170], jnp.int32)
    seed = 13 if dropout else None

    def f(q, k, v, table):
        out = pallas_relative_attention(
            q, k, v, table, geo, lengths, block_q=64, block_k=64,
            interpret=True, dropout_rate=dropout, dropout_seed=seed)
        return out

    def run():
        out, vjp = jax.vjp(f, q, k, v, table)
        g = jnp.ones_like(out)
        return [np.asarray(x) for x in (out, *vjp(g))]

    monkeypatch.setenv("MMT_ATTN_WINDOW_GRID", "list")
    got_list = run()
    monkeypatch.setenv("MMT_ATTN_WINDOW_GRID", "rect")
    got_rect = run()
    for a, b, name in zip(got_list, got_rect, ["out", "dq", "dk", "dv", "dt"]):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_window_requires_rel_and_global():
    geo = RelGeometry(text_max_distance=5, window=48, num_global=0)
    q, k, v, table = _rand_inputs(1, 128, 2, 16, 25)
    with pytest.raises(ValueError, match="num_global"):
        pallas_relative_attention(
            q, k, v, table, geo, jnp.asarray([128], jnp.int32),
            block_q=64, block_k=64, interpret=True)
    geo2 = RelGeometry(text_max_distance=5, window=48, num_global=16)
    with pytest.raises(ValueError, match="rel_table"):
        pallas_relative_attention(
            q, k, v, None, geo2, jnp.asarray([128], jnp.int32),
            block_q=64, block_k=64, interpret=True)


def _tiny_encoder_cfg(window):
    from mmt_tpu.configs.encoder import MmtEncoderConfig

    return MmtEncoderConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        relative_pos_max_distance=3, relative_vocab_size=40,
        relative_att_num_core_layers=1, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, compute_dtype="float32",
        attention_block_q=32, attention_block_k=32,
        attention_window=window,
    )


def _enc_inputs(batch=2, seq=128, n_patches=16, seed=7):
    rng = np.random.default_rng(seed)
    return dict(
        word_ids=jnp.asarray(rng.integers(0, 64, (batch, seq)), jnp.int32),
        segment_ids=jnp.ones((batch, seq), jnp.int32),
        patch_embeddings=jnp.asarray(
            rng.normal(size=(batch, n_patches, 27)), jnp.float32),
        lengths=jnp.asarray([seq, seq - 37], jnp.int32),
    )


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_encoder_window_changes_output_and_impls_agree(impl):
    """attention_window wired through config -> encoder -> both impls;
    auto num_global = 2 + P^2 = 18."""
    from mmt_tpu.models.encoder import MmtEncoder

    inputs = _enc_inputs()
    enc_w = MmtEncoder(_tiny_encoder_cfg(32).replace(attention_impl=impl),
                       num_patch_per_row=4)
    params = enc_w.init(jax.random.PRNGKey(0), **inputs)
    out_w = enc_w.apply(params, **inputs, deterministic=True)["sequence_output"]

    enc_d = MmtEncoder(_tiny_encoder_cfg(0).replace(attention_impl=impl),
                       num_patch_per_row=4)
    out_d = enc_d.apply(params, **inputs, deterministic=True)["sequence_output"]
    # The pattern changes the function.
    assert float(jnp.max(jnp.abs(out_w - out_d))) > 1e-3

    # Cross-impl parity at the encoder level.
    other = "pallas_interpret" if impl == "xla" else "xla"
    enc_o = MmtEncoder(_tiny_encoder_cfg(32).replace(attention_impl=other),
                       num_patch_per_row=4)
    out_o = enc_o.apply(params, **inputs, deterministic=True)["sequence_output"]
    m = np.asarray(_real_mask(inputs["lengths"], 128))[:, :, 0, :]
    np.testing.assert_allclose(
        np.asarray(out_w) * m, np.asarray(out_o) * m, atol=3e-4, rtol=1e-4)


def test_window_composes_with_sequence_sharding():
    """Windowed kernel under the 4-way seq-sharded schedule == windowed
    single-device kernel (fwd + grads): the pattern mask and tile skip
    use global positions, so shard offsets flow through unchanged."""
    from mmt_tpu.ops.pallas_attention import sequence_sharded_pallas_attention
    from mmt_tpu.parallel import create_mesh

    geo = RelGeometry(text_max_distance=5, num_patch_per_row=4,
                      num_core_layers=1, window=48, num_global=18)
    B, S, H, D, V = 2, 256, 2, 16, 24
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed=11)
    lengths = jnp.asarray([256, 200], jnp.int32)
    w = jnp.arange(B * S * H * D, dtype=jnp.float32).reshape(B, S, H, D) * 1e-4
    w = w * jnp.asarray(_real_mask(lengths, S))

    def loss_single(q, k, v, table):
        out = pallas_relative_attention(
            q, k, v, table, geo, lengths, block_q=64, block_k=64,
            interpret=True)
        return jnp.sum(out * w)

    want_out = pallas_relative_attention(
        q, k, v, table, geo, lengths, block_q=64, block_k=64, interpret=True)
    want_g = jax.grad(loss_single, argnums=(0, 1, 2, 3))(q, k, v, table)

    mesh = create_mesh(num_data=2, num_model=4)
    with mesh:
        def sharded(q, k, v, table):
            return sequence_sharded_pallas_attention(
                q, k, v, table, geo, lengths, mesh=mesh, block_q=32,
                block_k=64, interpret=True)

        got_out = jax.jit(sharded)(q, k, v, table)

        def loss_sharded(q, k, v, table):
            return jnp.sum(sharded(q, k, v, table) * w)

        got_g = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2, 3)))(
            q, k, v, table)

    m = _real_mask(lengths, S)
    np.testing.assert_allclose(np.asarray(got_out) * m,
                               np.asarray(want_out) * m,
                               atol=3e-5, rtol=3e-5)
    for n, a, b in zip(["dq", "dk", "dv", "drel"], want_g, got_g):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4, err_msg=n)
