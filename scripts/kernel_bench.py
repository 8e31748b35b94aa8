#!/usr/bin/env python3
"""Micro-benchmark: one fused attention layer at flagship geometry.

Measures ms/layer for pallas_relative_attention at B=8, S=4096, H=12,
D=64, 2D geometry (P=14, r=1, dtd=12, vocab 49), bf16 inputs.

Honest timing on the tunneled TPU (see CLAUDE.md): distinct inputs per
iteration + device->host transfer as the sync point.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmt_tpu.ops.pallas_attention import RelGeometry, pallas_relative_attention


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=49)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--block_q", type=int, default=None)
    ap.add_argument("--norel", action="store_true")
    ap.add_argument("--window", type=int, default=0,
                    help="sliding-window width (0 = dense)")
    ap.add_argument("--num_global", type=int, default=198,
                    help="prefix-global tokens (default: the image part)")
    ap.add_argument("--minlen", type=int, default=None,
                    help="min length (default S//2); S => no padding")
    ap.add_argument("--bwd", action="store_true", help="time fwd+bwd")
    ap.add_argument("--bwdall", action="store_true",
                    help="time fwd+bwd with ALL cotangents consumed "
                         "(dq+dk+dv+dtab); grad-wrt-q-only lets XLA drop "
                         "the split schedule's dkv pass")
    args = ap.parse_args()

    B, S, H, D = args.batch, args.seq, args.heads, args.dim
    geo = RelGeometry(text_max_distance=12, num_patch_per_row=14, num_core_layers=1,
                      window=args.window,
                      num_global=args.num_global if args.window else 0)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    tab = jnp.asarray(rng.normal(size=(args.vocab, H, D)), jnp.float32)
    minlen = args.minlen if args.minlen is not None else S // 2
    lengths = jnp.asarray(rng.integers(minlen, S + 1, (B,)), jnp.int32)

    rel = (None, None) if args.norel else (tab, geo)

    # k/v/tab are explicit jit ARGUMENTS: closed-over device arrays get
    # embedded as dense constants in the lowered module, and on this
    # relay toolchain the compile request then ships the full tensors
    # (HTTP 413 at S=16384: 2x ~200 MB constants exceed the body limit;
    # smaller shapes compiled but paid the upload on every new shape).
    def layer4(q, k, v, tab):
        return pallas_relative_attention(
            q, k, v, tab if not args.norel else None, rel[1], lengths,
            block_q=args.block_q or args.block, block_k=args.block)

    if args.bwdall:
        def once(q, k, v, tab):
            # All four cotangents flow into the result so no pass is DCE'd.
            grads = jax.grad(
                lambda q_, k_, v_, t_: jnp.sum(
                    layer4(q_, k_, v_, t_).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2, 3) if not args.norel else (0, 1, 2),
            )(q, k, v, tab)
            dq, dk, dv = grads[0], grads[1], grads[2]
            mix = (jnp.mean(dk.astype(jnp.float32))
                   + jnp.mean(dv.astype(jnp.float32)))
            if not args.norel:
                mix = mix + jnp.mean(grads[3])
            return dq + jnp.bfloat16(1e-12) * mix.astype(jnp.bfloat16)
    elif args.bwd:
        def once(q, k, v, tab):
            return jax.grad(
                lambda q_: jnp.sum(
                    layer4(q_, k, v, tab).astype(jnp.float32) ** 2))(q)
    else:
        once = layer4

    # Slope timing: chain the kernel K times inside one jit (output feeds
    # the next input, forcing sequential execution); per-layer time is the
    # slope between K and 2K chains, cancelling dispatch/tunnel overhead.
    K = args.iters

    def chain(q, k, v, tab, n):
        def body(i, acc):
            return once(acc, k, v, tab) + jnp.bfloat16(1e-6) * i
        return jax.lax.fori_loop(0, n, body, q)

    f1 = jax.jit(lambda q, k, v, tab: chain(q, k, v, tab, K))
    f2 = jax.jit(lambda q, k, v, tab: chain(q, k, v, tab, 2 * K))

    t0 = time.perf_counter()
    np.asarray(f1(q, k, v, tab)[0, 0, 0])
    np.asarray(f2(q, k, v, tab)[0, 0, 0])
    print(f"compile: {time.perf_counter() - t0:.1f}s")

    def t(fn, qi):
        t0 = time.perf_counter()
        np.asarray(fn(qi, k, v, tab)[0, 0, 0])
        return time.perf_counter() - t0

    t(f1, q); t(f2, q)  # warm
    t1 = min(t(f1, q + jnp.bfloat16(0.01 * i)) for i in range(3))
    t2 = min(t(f2, q + jnp.bfloat16(0.01 * i)) for i in range(3))
    dt = (t2 - t1) / K
    wtag = f" window={args.window}/g{args.num_global}" if args.window else ""
    mode = "fwd+bwd(all)" if args.bwdall else ("fwd+bwd" if args.bwd else "fwd")
    print(f"{mode} B={B} S={S} H={H} D={D} "
          f"block={args.block} rel={not args.norel}{wtag}: {dt * 1e3:.2f} "
          f"ms/layer (t{K}={t1 * 1e3:.1f}ms t{2 * K}={t2 * 1e3:.1f}ms)")


if __name__ == "__main__":
    main()
