#!/usr/bin/env python3
"""Marginal cost of individual ops inside a pallas kernel at bench scale.

Same grid as the flagship attention kernel (B*H*nq*nk = 6144 steps of
[512, 512] work); each variant adds one op family on top of a common
baseline; the delta vs baseline is that op's cost across the grid.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, S, D = 8, 12, 4096, 64
BQ = BK = 512
NQ, NK = S // BQ, S // BK
DTD = 12


def make(variant):
    def kernel(q_ref, r_ref, o_ref, acc):
        qi = pl.program_id(2)
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        q = q_ref[0, 0]
        qr = jax.lax.dot_general(q, r_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        shape = (BQ, BK)
        delta = (ki - qi) * BK
        s = jnp.zeros(shape, jnp.float32)

        if variant == "iota2":
            ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            s = s + (jj - ii).astype(jnp.float32)
        elif variant == "cmp2sel":
            ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            jmi = jj - ii
            right = jmi > DTD - delta
            left = jmi < -DTD - delta
            s = jnp.where(right | left, 1.0, s)
        elif variant == "bcast":
            s = s + qr[:, DTD][:, None]
        elif variant == "bcast2":
            s = s + qr[:, DTD][:, None] + qr[:, 2 * DTD][:, None]
        elif variant == "strip":
            cols = [qr[:, 2 * DTD - c:2 * DTD - c + 1] for c in range(DTD)]
            cols.append(qr[:, 0:DTD + 1])
            strip = jnp.concatenate(cols, axis=1)
            s = s + jnp.pad(strip, ((0, 0), (0, BK - strip.shape[1])))
        elif variant == "roll":
            padded = jnp.pad(qr[:, :2 * DTD + 1], ((0, 0), (0, BK - 2 * DTD - 1)))
            dyn = jnp.asarray(-(DTD + delta) % BK, jnp.int32)
            s = s + pltpu.roll(padded, dyn, 1, stride=1, stride_axis=0)
        elif variant == "roll_static":
            padded = jnp.pad(qr[:, :2 * DTD + 1], ((0, 0), (0, BK - 2 * DTD - 1)))
            s = s + pltpu.roll(padded, -DTD, 1, stride=1, stride_axis=0)
        elif variant == "rollu":
            padded = jnp.pad(qr[:, :2 * DTD + 1], ((0, 0), (0, BK - 2 * DTD - 1)))
            s = s + pltpu.roll(padded, -(DTD + delta), 1)
        elif variant == "exp":
            s = jnp.exp(s + q[:, 0][:, None])
        elif variant == "reduce":
            s = s + jnp.max(s + q[:, 0][:, None], axis=1)[:, None]
        elif variant == "select3":
            ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            jmi = jj - ii
            right = jmi > DTD - delta
            left = jmi < -DTD - delta
            ev = jnp.where(right, qr[:, DTD][:, None], qr[:, 2 * DTD][:, None])
            s = jnp.where(right | left, ev, s)
        elif variant == "leanbias":
            ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            jmi = jj - ii
            right = jmi > DTD - delta
            left = jmi < -DTD - delta
            ev = jnp.where(right, qr[:, DTD][:, None], qr[:, 2 * DTD][:, None])
            padded = jnp.pad(qr[:, :2 * DTD + 1], ((0, 0), (0, BK - 2 * DTD - 1)))
            dyn = jnp.asarray(-(DTD + delta) % BK, jnp.int32)
            rolled = pltpu.roll(padded, dyn, 1, stride=1, stride_axis=0)
            bias = jnp.where(right | left, ev, rolled)
            ti = ii >= 196 - qi * BQ
            tj = jj >= 196 - ki * BK
            s = s + jnp.where(ti & tj, bias, 0.0)
        elif variant == "mulbias":
            # Full flagship bias chain in multiply/FMA form (no selects).
            ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            jmi = jj - ii
            rightf = (jmi > DTD - delta).astype(jnp.float32)
            leftf = (jmi < -DTD - delta).astype(jnp.float32)
            ttf = ((ii >= 196 - qi * BQ) & (jj >= 196 - ki * BK)).astype(
                jnp.float32)
            padded = jnp.pad(qr[:, :2 * DTD + 1], ((0, 0), (0, BK - 2 * DTD - 1)))
            dyn = jnp.asarray(-(DTD + delta) % BK, jnp.int32)
            rolled = pltpu.roll(padded, dyn, 1, stride=1, stride_axis=0)
            a = qr[:, DTD][:, None]
            b2 = qr[:, 2 * DTD][:, None]
            bandf = 1.0 - rightf - leftf
            s = s + (a * rightf + b2 * leftf + rolled * bandf) * ttf
        elif variant == "mixbias":
            # rl select kept, ev via FMA, tt via multiply.
            ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            jmi = jj - ii
            right = jmi > DTD - delta
            left = jmi < -DTD - delta
            ttf = ((ii >= 196 - qi * BQ) & (jj >= 196 - ki * BK)).astype(
                jnp.float32)
            padded = jnp.pad(qr[:, :2 * DTD + 1], ((0, 0), (0, BK - 2 * DTD - 1)))
            dyn = jnp.asarray(-(DTD + delta) % BK, jnp.int32)
            rolled = pltpu.roll(padded, dyn, 1, stride=1, stride_axis=0)
            ev = jnp.where(right, qr[:, DTD][:, None], qr[:, 2 * DTD][:, None])
            s = s + jnp.where(right | left, ev, rolled) * ttf
        elif variant == "selmul":
            # one select (rl over ev/rolled), everything else arithmetic
            ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            jmi = jj - ii
            rightf = (jmi > DTD - delta).astype(jnp.float32)
            left = jmi < -DTD - delta
            ttf = ((ii >= 196 - qi * BQ) & (jj >= 196 - ki * BK)).astype(
                jnp.float32)
            padded = jnp.pad(qr[:, :2 * DTD + 1], ((0, 0), (0, BK - 2 * DTD - 1)))
            dyn = jnp.asarray(-(DTD + delta) % BK, jnp.int32)
            rolled = pltpu.roll(padded, dyn, 1, stride=1, stride_axis=0)
            b2 = qr[:, 2 * DTD][:, None]
            ev = b2 + rightf * (qr[:, DTD][:, None] - b2)
            s = s + jnp.where(left | (rightf > 0), ev, rolled) * ttf
        elif variant == "rev":
            s2 = s + q[:, 0][:, None]
            s = s + jnp.flip(s2, axis=0)
        elif variant == "revrollrev":
            # backward band-scatter candidate: flip rows, strided roll,
            # flip back (inverse skew of the forward roll).
            s2 = s + q[:, 0][:, None]
            dyn = jnp.asarray((DTD + delta - BQ + 1) % BK, jnp.int32)
            rolled = pltpu.roll(jnp.flip(s2, axis=0), dyn, 1, stride=1,
                                stride_axis=0)
            s = s + jnp.flip(rolled, axis=0)
        elif variant == "rollneg":
            # negative-stride roll (if the compiler accepts it)
            s2 = s + q[:, 0][:, None]
            dyn = jnp.asarray((DTD + delta) % BK, jnp.int32)
            s = s + pltpu.roll(s2, dyn, 1, stride=-1, stride_axis=0)
        elif variant == "cond2":
            def generalb():
                return s + qr[:, DTD][:, None]
            def farb():
                return s + qr[:, 2 * DTD][:, None]
            s = jax.lax.cond((qi + ki) % 2 == 0, generalb, farb)
        elif variant == "matmul":
            s = s + jax.lax.dot_general(
                q, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "rank1dot":
            # lane-broadcast via MXU: [bq,1] x [1,bk] outer product.
            ones_row = jnp.ones((1, BK), jnp.float32)
            s = s + jax.lax.dot_general(
                qr[:, DTD:DTD + 1], ones_row, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "rank2dot":
            # two broadcast terms in one [bq,2] x [2,bk] MXU dot.
            rows = jnp.concatenate(
                [jnp.ones((1, BK), jnp.float32),
                 jnp.full((1, BK), 0.5, jnp.float32)], axis=0)
            s = s + jax.lax.dot_general(
                qr[:, DTD:DTD + 2], rows, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "deskew":
            # dsv band gather: mask-mul + inverse skew roll (stride
            # BK-1 == -1 mod BK) + one [BQ,BK]x[BK,128] f32 matmul.
            ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            offs = jj - ii + delta
            bandf = ((offs >= -DTD) & (offs <= DTD)).astype(jnp.float32)
            dyn = jnp.asarray((DTD + delta) % BK, jnp.int32)
            desk = pltpu.roll((s + qr[:, :1]) * bandf, dyn, 1,
                              stride=BK - 1, stride_axis=0)
            rr = jax.lax.broadcasted_iota(jnp.int32, (BK, 128), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (BK, 128), 1)
            vid_of_r = jnp.where(rr >= DTD, rr - DTD, 2 * DTD - rr)
            pmat = ((rr <= 2 * DTD) & (cc == vid_of_r)).astype(jnp.float32)
            dsv = jax.lax.dot_general(
                desk, pmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + dsv[:, :1]
        elif variant == "narrowroll":
            # strided roll on a 128-lane tile (1/4 the area).
            dyn = jnp.asarray(-(DTD + delta) % 128, jnp.int32)
            nr = pltpu.roll(qr[:, :128], dyn, 1, stride=1, stride_axis=0)
            s = s + nr[:, :1]
        assert s.shape == shape
        acc[...] = acc[...] + jnp.sum(s, axis=1, keepdims=True) * (1.0 + qr[:, :1])

        @pl.when(ki == NK - 1)
        def _():
            o_ref[0, 0] = acc[...]

    return kernel


def bench(variant, q, r):
    kern = make(variant)
    f = pl.pallas_call(
        kern,
        grid=(B, H, NQ, NK),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 128, D), lambda b, h, qi, ki: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BQ, 1), lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, S, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BQ, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    K = 6

    def chain(x, n):
        def body(i, acc):
            return f(acc + 1e-6 * i, r) * 1e-6 + acc
        return jax.lax.fori_loop(0, n, body, x)

    f1 = jax.jit(functools.partial(chain, n=K))
    f2 = jax.jit(functools.partial(chain, n=2 * K))
    np.asarray(f1(q)[0, 0, 0]); np.asarray(f2(q)[0, 0, 0])

    def t(fn):
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(q + 0.001 * i)[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(f2) - t(f1)) / K
    return dt * 1e3


if __name__ == "__main__":
    import sys
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(H, 128, D)), jnp.float32)
    variants = sys.argv[1:] or [
        "base", "iota2", "cmp2sel", "bcast", "bcast2", "strip",
        "roll_static", "roll", "rollu", "select3", "exp", "reduce", "matmul",
    ]
    base = None
    for v in variants:
        ms = bench(v, q, r)
        if v == "base":
            base = ms
            print(f"{v:12s}: {ms:7.2f} ms")
        else:
            extra = f"  (+{ms - base:6.2f})" if base is not None else ""
            print(f"{v:12s}: {ms:7.2f} ms{extra}")
