#!/usr/bin/env python3
"""On-TPU compile + parity smoke for the windowed list-driven kernels.

The list grids (fwd/dq/dkv over a static (qi, ki) tile table) were
interpret-verified in tests/test_window_attention.py; this script proves
the remote Mosaic toolchain compiles them and that list == rect on real
hardware (the relay has rejected interpret-accepted constructs before —
see CLAUDE.md).  Small S so compiles stay cheap.

Usage: python scripts/window_tpu_smoke.py [--seq 1024] [--block 256]
"""
import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--window", type=int, default=256)
    ap.add_argument("--num_global", type=int, default=198)
    ap.add_argument("--dropout", type=float, default=0.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mmt_tpu.ops.pallas_attention import (
        RelGeometry, pallas_relative_attention)

    print("devices:", jax.devices(), flush=True)

    B, S, H, D, V = 2, args.seq, 4, 64, 49
    geo = RelGeometry(text_max_distance=12, num_patch_per_row=14,
                      num_core_layers=1, window=args.window,
                      num_global=args.num_global)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    tab = jnp.asarray(rng.normal(size=(V, H, D)), jnp.float32)
    lengths = jnp.asarray([S, S - S // 3], jnp.int32)
    seed = 7 if args.dropout else None

    def run(grid):
        os.environ["MMT_ATTN_WINDOW_GRID"] = grid

        # A fresh closure per grid mode keeps jit from reusing the other
        # mode's trace (the env flag is read at trace time).  The vjp
        # returns (out, grads): `out` as a program RESULT materializes
        # the bf16 rounding (a sum-of-squares loss alone lets XLA elide
        # the list path's f32->bf16->f32 round-trip, which shows up as a
        # spurious ~1e-5 drift vs the rect kernel's in-kernel cast).
        def f(q, k, v, tab, _grid=grid):
            return pallas_relative_attention(
                q, k, v, tab, geo, lengths,
                block_q=args.block, block_k=args.block,
                dropout_rate=args.dropout, dropout_seed=seed)

        def fg(q, k, v, tab):
            out, vjp = jax.vjp(f, q, k, v, tab)
            g = (out.astype(jnp.float32) * 2.0).astype(out.dtype)
            return out, vjp(g)

        out, grads = jax.jit(fg)(q, k, v, tab)
        # Device->host transfer is the sync point on the relay.
        return np.asarray(out), [np.asarray(g) for g in grads]

    print("compiling rect...", flush=True)
    out_r, g_r = run("rect")
    print("rect ok, |out| =", np.abs(out_r.astype(np.float32)).sum(), flush=True)
    print("compiling list...", flush=True)
    out_l, g_l = run("list")
    print("list ok, |out| =", np.abs(out_l.astype(np.float32)).sum(), flush=True)

    np.testing.assert_array_equal(out_l, out_r, err_msg="out")
    for a, b, name in zip(g_l, g_r, ["dq", "dk", "dv", "dtab"]):
        np.testing.assert_allclose(
            a.astype(np.float32), b.astype(np.float32),
            rtol=2e-2, atol=2e-2, err_msg=name)
    print("PASS: list == rect on TPU "
          f"(S={S}, block={args.block}, window={args.window}, "
          f"g={args.num_global}, dropout={args.dropout})")


if __name__ == "__main__":
    main()
