#!/usr/bin/env python3
"""Time the two passes of the split forward separately (TPU)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mmt_tpu.ops import pallas_attention as pa

B, S, H, D = 8, 4096, 12, 64
BQ = BK = 512
geo = pa.RelGeometry(text_max_distance=12, num_patch_per_row=14, num_core_layers=1)
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
tab = jnp.asarray(rng.normal(size=(49, H, D)), jnp.float32)
lengths = jnp.asarray(rng.integers(S // 2, S + 1, (B,)), jnp.int32)

_, _, nq, nk, rel_vocab, v_pad, rel_h, meta = pa._prepare(q, k, tab, geo, BQ, BK)
meta_np = pa._build_tile_meta(geo, S, BQ, BK)
far_list, struct_list = pa._split_tile_lists(meta_np, nq, nk)
print(f"far={far_list.shape[1]-1} struct={struct_list.shape[1]-1}")

which = sys.argv[1] if len(sys.argv) > 1 else "both"


# Directly poke the internals: replicate run() for one list.
def one_pass(tlist, far):
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    scale = 1.0 / (D ** 0.5)
    hb = 4

    def im_q(b, h, t, lens, qoff_, meta_, tm):
        return (b, h, tm[0, t], 0)

    def im_k(b, h, t, lens, qoff_, meta_, tm):
        return (b, h, tm[1, t], 0)

    kernel = functools.partial(
        pa._fwd_list_kernel, geo=geo, rel_vocab=rel_vocab,
        block_q=BQ, block_k=BK, nk=nk, hb=hb, softmax_scale=scale, far=far,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, H // hb, tlist.shape[1] - 1),
        in_specs=[
            pl.BlockSpec((1, hb, BQ, D), im_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, BK, D), im_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, BK, D), im_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, v_pad, D), lambda b, h, t, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, hb, BQ, D), im_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, BQ, 1),
                         lambda b, h, t, lens, qoff_, meta_, tm: (b, h, tm[0, t], 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((hb, BQ, 128), jnp.float32),
            pltpu.VMEM((hb, BQ, 128), jnp.float32),
            pltpu.VMEM((hb, BQ, D), jnp.float32),
        ],
    )

    def f(qi_):
        qt_ = qi_.transpose(0, 2, 1, 3)
        o, lse = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(qt_.shape, jnp.float32),
                jax.ShapeDtypeStruct((B, H, S, 1), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(lengths, jnp.zeros((4,), jnp.int32), jnp.asarray(meta_np),
          jnp.asarray(tlist), qt_, kt, vt, rel_h)
        return o.transpose(0, 2, 1, 3)
    return f


def slope_time(fn, label):
    K = 6

    def chain(x, n):
        def body(i, acc):
            return fn(acc.astype(jnp.bfloat16) + jnp.bfloat16(1e-6) * i)
        return jax.lax.fori_loop(0, n, body, x.astype(jnp.float32))

    f1 = jax.jit(lambda x: chain(x, K))
    f2 = jax.jit(lambda x: chain(x, 2 * K))
    t0 = time.perf_counter()
    np.asarray(f1(q)[0, 0, 0]); np.asarray(f2(q)[0, 0, 0])
    print(f"{label} compile: {time.perf_counter()-t0:.0f}s")

    def t(fn_, x):
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(fn_(x + 0.001 * i)[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(f2, q) - t(f1, q)) / K
    print(f"{label}: {dt*1e3:.2f} ms/call")


if which in ("far", "both"):
    slope_time(one_pass(far_list, True), "far  ")
if which in ("struct", "both"):
    slope_time(one_pass(struct_list, False), "struct")
