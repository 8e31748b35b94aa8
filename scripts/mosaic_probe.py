#!/usr/bin/env python3
"""Probe remote-Mosaic support for primitives needed by the band fast path.

Each probe compiles + runs a tiny kernel on the attached TPU and checks
numerics against numpy. Run: PYTHONPATH=... python scripts/mosaic_probe.py
"""
import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        ok = fn()
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


def probe_strided_roll():
    # skew: row i rolled right by i
    def kernel(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 0, 1, stride=1, stride_dimension=0)

    x = np.arange(64 * 256, dtype=np.float32).reshape(64, 256)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
    )(jnp.asarray(x))
    out = np.asarray(out)
    exp = np.stack([np.roll(x[i], i) for i in range(64)])
    return np.array_equal(out, exp)


def probe_static_unaligned_store():
    # store a [8, 64] block at lane offset 20 (not 128-aligned)
    def kernel(x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[8:16, 20:84] = x_ref[...]

    x = np.arange(8 * 64, dtype=np.float32).reshape(8, 64)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
    )(jnp.asarray(x))
    out = np.asarray(out)
    exp = np.zeros((64, 256), np.float32)
    exp[8:16, 20:84] = x
    return np.array_equal(out, exp)


def probe_many_static_stores():
    # 32 static block stores at increasing unaligned offsets (the skew)
    def kernel(x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        for g in range(32):
            off = max(8 * g - 12, 0)
            o_ref[8 * g:8 * g + 8, off:off + 40] = x_ref[8 * g:8 * g + 8, :]

    x = np.arange(256 * 40, dtype=np.float32).reshape(256, 40)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32),
    )(jnp.asarray(x))
    out = np.asarray(out)
    exp = np.zeros((256, 512), np.float32)
    for g in range(32):
        off = max(8 * g - 12, 0)
        exp[8 * g:8 * g + 8, off:off + 40] = x[8 * g:8 * g + 8, :]
    return np.array_equal(out, exp)


def probe_dynamic_lane_store():
    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        off = s_ref[0]
        o_ref[0:8, pl.ds(off, 64)] = x_ref[...]

    x = np.arange(8 * 64, dtype=np.float32).reshape(8, 64)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((8, 64), lambda i, *_: (0, 0))],
            out_specs=pl.BlockSpec((64, 256), lambda i, *_: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
    )(jnp.asarray([36], jnp.int32), jnp.asarray(x))
    out = np.asarray(out)
    exp = np.zeros((64, 256), np.float32)
    exp[0:8, 36:100] = x
    return np.array_equal(out, exp)


def probe_uniform_dynamic_roll():
    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], 1)

    x = np.arange(64 * 256, dtype=np.float32).reshape(64, 256)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((64, 256), lambda i, *_: (0, 0))],
            out_specs=pl.BlockSpec((64, 256), lambda i, *_: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((64, 256), jnp.float32),
    )(jnp.asarray([5], jnp.int32), jnp.asarray(x))
    return np.array_equal(np.asarray(out), np.roll(x, 5, axis=1))


def probe_small_matmul():
    # [256, 128] @ [128, 64] fp32 in-kernel
    def kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 128)).astype(np.float32)
    w = rng.normal(size=(128, 64)).astype(np.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 64), jnp.float32),
    )(jnp.asarray(x), jnp.asarray(w))
    return np.allclose(np.asarray(out), x @ w, atol=1e-3)


if __name__ == "__main__":
    run("strided_roll", probe_strided_roll)
    run("static_unaligned_store", probe_static_unaligned_store)
    run("many_static_stores", probe_many_static_stores)
    run("dynamic_lane_store", probe_dynamic_lane_store)
    run("uniform_dynamic_roll", probe_uniform_dynamic_roll)
    run("small_matmul", probe_small_matmul)
