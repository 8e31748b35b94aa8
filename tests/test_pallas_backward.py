"""Gradient parity: Pallas custom VJP vs autodiff through the dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmt_tpu.ops.pallas_attention import RelGeometry, pallas_relative_attention
from tests.test_pallas_attention import (
    _ids_for,
    _rand_inputs,
    _real_mask,
    dense_reference,
)


def _grads(fn, args, diff_idx, mask=None):
    def loss(*diff_args):
        full = list(args)
        for i, a in zip(diff_idx, diff_args):
            full[i] = a
        out = fn(*full)
        # Weighted sum as a scalar loss touching everything real (pad
        # rows are excluded: their outputs are unspecified since the
        # kernel skips pad x pad tiles).
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) * 1e-3
        if mask is not None:
            w = w * jnp.asarray(mask)
        return jnp.sum(out * w)

    return jax.grad(loss, argnums=tuple(range(len(diff_idx))))(
        *[args[i] for i in diff_idx]
    )


def _compare(geo, B, S, H, D, V, lengths, block, atol=3e-4):
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed=3)
    lengths = jnp.asarray(lengths, jnp.int32)
    ids = _ids_for(geo, S) if geo is not None else None

    def dense_fn(q, k, v, table):
        return dense_reference(q, k, v, table if geo else None, ids, lengths)

    def pallas_fn(q, k, v, table):
        return pallas_relative_attention(
            q, k, v, table if geo else None, geo, lengths,
            block_q=block, block_k=block, interpret=True,
        )

    args = (q, k, v, table)
    m = _real_mask(lengths, S)
    want = _grads(dense_fn, args, (0, 1, 2, 3), mask=m)
    got = _grads(pallas_fn, args, (0, 1, 2, 3), mask=m)
    names = ["dq", "dk", "dv", "drel"]
    for n, w, g in zip(names, want, got):
        if geo is None and n == "drel":
            continue
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=atol, rtol=atol, err_msg=n
        )


@pytest.mark.parametrize("dsv_mode", ["mxu", "loop"])
def test_grads_2d_geometry(monkeypatch, dsv_mode):
    # Both dRelTable band-scatter implementations: the MXU deskew
    # (default) and the per-offset loop fallback.
    monkeypatch.setenv("MMT_ATTN_DSV", dsv_mode)
    geo = RelGeometry(text_max_distance=5, num_patch_per_row=4, num_core_layers=1)
    _compare(geo, B=2, S=128, H=2, D=16, V=24, lengths=[128, 100], block=64)


def test_grads_2d_multi_tile_with_parts():
    geo = RelGeometry(text_max_distance=3, num_patch_per_row=4, num_core_layers=1)
    V = geo.text_part_id + 1  # parts in vocab -> cross-part grads too
    _compare(geo, B=1, S=192, H=2, D=16, V=V, lengths=[160], block=64)


def test_grads_1d_geometry():
    geo = RelGeometry(text_max_distance=7)
    _compare(geo, B=2, S=256, H=2, D=32, V=15, lengths=[256, 180], block=128)


def test_grads_no_rel():
    def dense_fn(q, k, v):
        return dense_reference(q, k, v, None, None, lengths)

    def pallas_fn(q, k, v):
        return pallas_relative_attention(
            q, k, v, None, None, lengths, block_q=64, block_k=64, interpret=True
        )

    q, k, v, _ = _rand_inputs(1, 128, 2, 16, 1, seed=5)
    lengths = jnp.asarray([100], jnp.int32)
    args = (q, k, v)
    m = _real_mask(lengths, 128)
    want = _grads(dense_fn, args, (0, 1, 2), mask=m)
    got = _grads(pallas_fn, args, (0, 1, 2), mask=m)
    for n, w, g in zip(["dq", "dk", "dv"], want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=3e-4, rtol=3e-4, err_msg=n
        )


def test_grads_through_sequence_sharding():
    """Grads via shard_map (4-way seq shards) == single-device kernel grads."""
    from mmt_tpu.ops.pallas_attention import sequence_sharded_pallas_attention
    from mmt_tpu.parallel import create_mesh

    geo = RelGeometry(text_max_distance=5, num_patch_per_row=4, num_core_layers=1)
    B, S, H, D, V = 2, 256, 2, 16, 24
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed=21)
    lengths = jnp.asarray([256, 200], jnp.int32)
    w = jnp.arange(B * S * H * D, dtype=jnp.float32).reshape(B, S, H, D) * 1e-4
    w = w * jnp.asarray(_real_mask(lengths, S))

    def loss_single(q, k, v, table):
        out = pallas_relative_attention(
            q, k, v, table, geo, lengths, block_q=64, block_k=64, interpret=True
        )
        return jnp.sum(out * w)

    want = jax.grad(loss_single, argnums=(0, 1, 2, 3))(q, k, v, table)

    mesh = create_mesh(num_data=2, num_model=4)
    with mesh:
        def loss_sharded(q, k, v, table):
            out = sequence_sharded_pallas_attention(
                q, k, v, table, geo, lengths, mesh=mesh, block_q=32,
                block_k=64, interpret=True,
            )
            return jnp.sum(out * w)

        got = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2, 3)))(q, k, v, table)

    for n, a, b in zip(["dq", "dk", "dv", "drel"], want, got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4, err_msg=n
        )


def test_grads_through_ring_sharding():
    """Ring-schedule grads == single-device kernel grads."""
    from mmt_tpu.ops.pallas_attention import ring_sequence_sharded_pallas_attention
    from mmt_tpu.parallel import create_mesh

    geo = RelGeometry(text_max_distance=5, num_patch_per_row=4, num_core_layers=1)
    B, S, H, D, V = 2, 256, 2, 16, 24
    q, k, v, table = _rand_inputs(B, S, H, D, V, seed=23)
    lengths = jnp.asarray([256, 200], jnp.int32)
    w = jnp.arange(B * S * H * D, dtype=jnp.float32).reshape(B, S, H, D) * 1e-4
    w = w * jnp.asarray(_real_mask(lengths, S))

    def loss_single(q, k, v, table):
        out = pallas_relative_attention(
            q, k, v, table, geo, lengths, block_q=32, block_k=32, interpret=True
        )
        return jnp.sum(out * w)

    want = jax.grad(loss_single, argnums=(0, 1, 2, 3))(q, k, v, table)

    mesh = create_mesh(num_data=2, num_model=4)
    with mesh:
        def loss_ring(q, k, v, table):
            out = ring_sequence_sharded_pallas_attention(
                q, k, v, table, geo, lengths, mesh=mesh, block_q=32,
                block_k=32, interpret=True,
            )
            return jnp.sum(out * w)

        got = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2, 3)))(q, k, v, table)

    for n, a, b in zip(["dq", "dk", "dv", "drel"], want, got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4, err_msg=n
        )


@pytest.mark.parametrize("dropout", [0.0, 0.3])
def test_fused_backward_matches_split(monkeypatch, dropout):
    """The one-pass fused backward (default) is bit-identical to the
    two-pass dq/dkv schedule: the fused kernel's per-(ki) dk/dv sums see
    qi in the same ascending order, and dq/dRel are the dq pass
    unchanged."""
    geo = RelGeometry(text_max_distance=5, num_patch_per_row=4,
                      num_core_layers=1)
    q, k, v, table = _rand_inputs(2, 256, 4, 16, 32, seed=9)
    lengths = jnp.asarray([256, 170], jnp.int32)
    seed = 21 if dropout else None

    def f(q, k, v, table):
        return pallas_relative_attention(
            q, k, v, table, geo, lengths, block_q=64, block_k=64,
            interpret=True, dropout_rate=dropout, dropout_seed=seed)

    def run():
        out, vjp = jax.vjp(f, q, k, v, table)
        g = jnp.ones_like(out)
        return [np.asarray(x) for x in (out, *vjp(g))]

    monkeypatch.setenv("MMT_ATTN_BWD", "fused")
    got_fused = run()
    monkeypatch.setenv("MMT_ATTN_BWD", "split")
    got_split = run()
    for a, b, name in zip(got_fused, got_split,
                          ["out", "dq", "dk", "dv", "dt"]):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_fused_backward_no_rel_matches_split(monkeypatch):
    q, k, v, _ = _rand_inputs(1, 128, 2, 16, 8, seed=4)
    lengths = jnp.asarray([100], jnp.int32)

    def f(q, k, v):
        return pallas_relative_attention(
            q, k, v, None, None, lengths, block_q=64, block_k=64,
            interpret=True)

    def run():
        out, vjp = jax.vjp(f, q, k, v)
        return [np.asarray(x) for x in (out, *vjp(jnp.ones_like(out)))]

    monkeypatch.setenv("MMT_ATTN_BWD", "fused")
    a = run()
    monkeypatch.setenv("MMT_ATTN_BWD", "split")
    b = run()
    for x, y, name in zip(a, b, ["out", "dq", "dk", "dv"]):
        np.testing.assert_array_equal(x, y, err_msg=name)


def test_backward_head_packing_scratch_cap(monkeypatch):
    from mmt_tpu.ops.pallas_attention import _backward_head_packing

    monkeypatch.delenv("MMT_ATTN_HB_BWD", raising=False)
    monkeypatch.delenv("MMT_ATTN_BWD", raising=False)
    # Default fused: hb=2 while the dk/dv full-K VMEM residency
    # (2*hb*S*D*(4 fp32 scratch + itemsize output windows) bytes)
    # stays under ~17 MB, hb=1 beyond (measured: 16k hb=2 starves the
    # pipeline's double buffering -- see _backward_head_packing).
    assert _backward_head_packing(12, 4096, 64) == 2     # 6.3 MB
    assert _backward_head_packing(12, 8192, 64) == 2     # 12.6 MB
    assert _backward_head_packing(12, 16384, 64) == 1    # 25.2 -> cap
    # fp32 K/V output windows raise the residency: at S=10240 bf16
    # stays under the cap (15.7 MB) while fp32 exceeds it (21 MB).
    assert _backward_head_packing(12, 10240, 64, kv_itemsize=2) == 2
    assert _backward_head_packing(12, 10240, 64, kv_itemsize=4) == 1
    # Odd head counts can't pack pairs at all.
    assert _backward_head_packing(11, 4096, 64) == 1
    # The split schedule has no full-K scratch: no cap applies.
    monkeypatch.setenv("MMT_ATTN_BWD", "split")
    assert _backward_head_packing(12, 16384, 64) == 2
    monkeypatch.delenv("MMT_ATTN_BWD")
    # Explicit override skips the cap (probe escape hatch).
    monkeypatch.setenv("MMT_ATTN_HB_BWD", "4")
    assert _backward_head_packing(12, 16384, 64) == 4
    monkeypatch.setenv("MMT_ATTN_HB_BWD", "5")  # not a divisor -> 1
    assert _backward_head_packing(12, 4096, 64) == 1
