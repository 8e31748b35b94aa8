#!/usr/bin/env python3
"""On-TPU compile + parity smoke for the fused one-pass backward.

Compares MMT_ATTN_BWD=fused vs =split on real hardware at small S
(dense 2D geometry, padded lengths, optional dropout).  The fused
kernel's accumulation orders match the two-pass schedule, so grads
must be bit-identical.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--window", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mmt_tpu.ops.pallas_attention import (
        RelGeometry, pallas_relative_attention)

    print("devices:", jax.devices(), flush=True)

    B, S, H, D, V = 2, args.seq, 4, 64, 49
    geo = RelGeometry(text_max_distance=12, num_patch_per_row=14,
                      num_core_layers=1, window=args.window,
                      num_global=198 if args.window else 0)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    tab = jnp.asarray(rng.normal(size=(V, H, D)), jnp.float32)
    lengths = jnp.asarray([S, S - S // 3], jnp.int32)
    seed = 7 if args.dropout else None

    def run(mode):
        os.environ["MMT_ATTN_BWD"] = mode

        def f(q, k, v, tab, _mode=mode):
            return pallas_relative_attention(
                q, k, v, tab, geo, lengths,
                block_q=args.block, block_k=args.block,
                dropout_rate=args.dropout, dropout_seed=seed)

        def fg(q, k, v, tab):
            out, vjp = jax.vjp(f, q, k, v, tab)
            g = (out.astype(jnp.float32) * 2.0).astype(out.dtype)
            return out, vjp(g)

        out, grads = jax.jit(fg)(q, k, v, tab)
        return np.asarray(out), [np.asarray(g) for g in grads]

    print("compiling split...", flush=True)
    out_s, g_s = run("split")
    print("split ok", flush=True)
    print("compiling fused...", flush=True)
    out_f, g_f = run("fused")
    print("fused ok", flush=True)

    np.testing.assert_array_equal(out_f, out_s, err_msg="out")
    for a, b, name in zip(g_f, g_s, ["dq", "dk", "dv", "dtab"]):
        np.testing.assert_array_equal(a, b, err_msg=name)
    print(f"PASS: fused == split on TPU (S={S}, block={args.block}, "
          f"window={args.window}, dropout={args.dropout})")


if __name__ == "__main__":
    main()
