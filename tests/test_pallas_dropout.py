"""In-kernel attention dropout: exact parity against a dense reference
applying the *same* hash mask (the mask is a pure function exposed by
the module, so the test reconstructs it bit-for-bit on the host)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmt_tpu.ops import pallas_attention as pa
from mmt_tpu.ops.pallas_attention import RelGeometry, pallas_relative_attention
from tests.test_pallas_attention import (
    _ids_for,
    _rand_inputs,
    _real_mask,
    dense_reference,
)

BATCH_FOLD = np.int32(-1771729351)


def host_keep(seed, batch, heads, S, rate):
    """[B, H, S, S] keep factors identical to the kernel's hash."""
    i = jnp.arange(S, dtype=jnp.int32)[:, None] * jnp.ones((1, S), jnp.int32)
    j = jnp.arange(S, dtype=jnp.int32)[None, :] * jnp.ones((S, 1), jnp.int32)
    out = np.zeros((batch, heads, S, S), np.float32)
    for b in range(batch):
        seed_b = np.int32(seed) + np.int32(b) * BATCH_FOLD
        for h in range(heads):
            out[b, h] = np.asarray(
                pa._dropout_keep(jnp.int32(seed_b), jnp.int32(h), i, j, rate)
            )
    return out


def dense_with_dropout(q, k, v, rel_table, ids, lengths, keep):
    """Reference semantics: dropout on the normalized probabilities."""
    from mmt_tpu.ops.relative_attention_ref import relative_attention_scores

    logits = relative_attention_scores(q, k, rel_table, ids)
    S = q.shape[1]
    pos = jnp.arange(S)
    real = pos[None, :] < lengths[:, None]
    mask = (real[:, :, None] == real[:, None, :]).astype(jnp.float32)
    logits = logits + (1.0 - mask[:, None]) * pa.NEG_INF
    probs = jax.nn.softmax(logits, axis=-1) * keep
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


GEO = RelGeometry(text_max_distance=3, num_patch_per_row=2, num_core_layers=1)
B, S, H, D, V = 2, 256, 2, 16, 25
BLOCK = 64
RATE = 0.3
SEED = 1234


def _setup():
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed=9)
    lengths = jnp.asarray([256, 190], jnp.int32)
    return q, k, v, table, lengths


def test_rate_zero_is_identity():
    q, k, v, table, lengths = _setup()
    a = pallas_relative_attention(
        q, k, v, table, GEO, lengths, block_q=BLOCK, block_k=BLOCK,
        interpret=True,
    )
    b = pallas_relative_attention(
        q, k, v, table, GEO, lengths, block_q=BLOCK, block_k=BLOCK,
        interpret=True, dropout_rate=0.0, dropout_seed=jnp.int32(7),
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_seed_raises():
    # A silently-defaulted seed would repeat the identical mask every
    # step; the API must refuse instead.
    q, k, v, table, lengths = _setup()
    with pytest.raises(ValueError, match="dropout_seed"):
        pallas_relative_attention(
            q, k, v, table, GEO, lengths, block_q=BLOCK, block_k=BLOCK,
            interpret=True, dropout_rate=RATE,
        )


def test_forward_matches_masked_dense():
    q, k, v, table, lengths = _setup()
    keep = jnp.asarray(host_keep(SEED, B, H, S, RATE))
    ids = _ids_for(GEO, S)
    want = dense_with_dropout(q, k, v, table, ids, lengths, keep)
    got = pallas_relative_attention(
        q, k, v, table, GEO, lengths, block_q=BLOCK, block_k=BLOCK,
        interpret=True, dropout_rate=RATE, dropout_seed=jnp.int32(SEED),
    )
    m = _real_mask(lengths, S)
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(want) * m, atol=3e-5, rtol=3e-5
    )


def test_gradients_match_masked_dense():
    q, k, v, table, lengths = _setup()
    keep = jnp.asarray(host_keep(SEED, B, H, S, RATE))
    ids = _ids_for(GEO, S)
    m = jnp.asarray(_real_mask(lengths, S))
    w = jnp.arange(B * S * H * D, dtype=jnp.float32).reshape(B, S, H, D)
    w = w * 1e-3 * m

    def loss_dense(q, k, v, table):
        return jnp.sum(dense_with_dropout(q, k, v, table, ids, lengths, keep) * w)

    def loss_pallas(q, k, v, table):
        out = pallas_relative_attention(
            q, k, v, table, GEO, lengths, block_q=BLOCK, block_k=BLOCK,
            interpret=True, dropout_rate=RATE, dropout_seed=jnp.int32(SEED),
        )
        return jnp.sum(out * w)

    want = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, table)
    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, table)
    for n, a, b in zip(["dq", "dk", "dv", "drel"], got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=n
        )


def test_seed_changes_mask():
    q, k, v, table, lengths = _setup()

    def run(seed):
        return np.asarray(pallas_relative_attention(
            q, k, v, table, GEO, lengths, block_q=BLOCK, block_k=BLOCK,
            interpret=True, dropout_rate=RATE, dropout_seed=jnp.int32(seed),
        ))

    a, a2, c = run(1), run(1), run(2)
    np.testing.assert_array_equal(a, a2)  # deterministic per seed
    assert np.abs(a - c).max() > 1e-3  # different seeds differ


def test_keep_rate_statistics():
    keep = host_keep(77, 1, 1, 512, RATE)
    frac = (keep > 0).mean()
    assert abs(frac - (1 - RATE)) < 0.01
    # kept entries carry the inverse-keep scale
    assert np.allclose(keep[keep > 0], 1.0 / (1 - RATE))


def test_ring_sharded_dropout_matches_single():
    from mmt_tpu.ops.pallas_attention import ring_sequence_sharded_pallas_attention
    from mmt_tpu.parallel import create_mesh

    q, k, v, table, lengths = _setup()
    want = pallas_relative_attention(
        q, k, v, table, GEO, lengths, block_q=64, block_k=64, interpret=True,
        dropout_rate=RATE, dropout_seed=jnp.int32(SEED),
    )
    mesh = create_mesh(num_data=2, num_model=4)
    with mesh:
        got = jax.jit(
            lambda q, k, v, t, ln: ring_sequence_sharded_pallas_attention(
                q, k, v, t, GEO, ln, mesh=mesh, block_q=32, block_k=32,
                interpret=True, dropout_rate=RATE,
                dropout_seed=jnp.int32(SEED),
            )
        )(q, k, v, table, lengths)
    m = _real_mask(lengths, S)
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(want) * m, atol=3e-5, rtol=3e-5
    )


def test_model_training_uses_fused_with_dropout(monkeypatch):
    """A training step with attention dropout > 0 must stay on the fused
    kernel (the pre-dropout gate silently fell back to the dense path,
    which OOMs at 4k)."""
    from tests.test_models import tiny_encoder_config
    from mmt_tpu.models.encoder import MmtEncoder

    calls = {"n": 0}
    orig = pa.pallas_relative_attention

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    import mmt_tpu.models.relative_attention as ra
    monkeypatch.setattr(ra, "pallas_relative_attention", spy)

    rng = np.random.default_rng(1)
    Ss, P_, Bs = 16, 2, 2
    inputs = dict(
        word_ids=jnp.asarray(rng.integers(0, 60, (Bs, Ss)), jnp.int32),
        patch_embeddings=jnp.asarray(rng.normal(size=(Bs, 4, 12)), jnp.float32),
        lengths=jnp.full((Bs,), Ss, jnp.int32),
    )
    cfg = tiny_encoder_config(
        attention_impl="pallas_interpret", attention_block_q=8,
        attention_block_k=8, attention_probs_dropout_prob=0.1,
    )
    enc = MmtEncoder(cfg, num_patch_per_row=P_)
    params = enc.init(jax.random.PRNGKey(0), **inputs)

    def loss(p, key):
        out = enc.apply(
            p, **inputs, deterministic=False,
            rngs={"dropout": key},
        )["sequence_output"]
        return jnp.sum(out**2)

    g = jax.grad(loss)(params, jax.random.PRNGKey(3))
    assert calls["n"] > 0  # fused path taken in training mode
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_split_schedule_with_dropout(monkeypatch):
    """Forced far/structured split + dropout: each (q, k) pair lives in
    exactly one pass, so the combined output must equal the full-kernel
    dropout output exactly."""
    monkeypatch.setenv("MMT_ATTN_SPLIT", "1")
    q, k, v, table, lengths = _setup()
    got_split = pallas_relative_attention(
        q, k, v, table, GEO, lengths, block_q=BLOCK, block_k=BLOCK,
        interpret=True, dropout_rate=RATE, dropout_seed=jnp.int32(SEED),
    )
    monkeypatch.setenv("MMT_ATTN_SPLIT", "0")
    got_full = pallas_relative_attention(
        q, k, v, table, GEO, lengths, block_q=BLOCK, block_k=BLOCK,
        interpret=True, dropout_rate=RATE, dropout_seed=jnp.int32(SEED),
    )
    m = _real_mask(lengths, S)
    np.testing.assert_allclose(
        np.asarray(got_split) * m, np.asarray(got_full) * m,
        atol=1e-5, rtol=1e-5,
    )
