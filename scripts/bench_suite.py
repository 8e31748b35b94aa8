#!/usr/bin/env python3
"""Benchmark suite: the BASELINE.md config matrix, one JSON line each.

Covers (all on the attached TPU chip, bf16 + fused Pallas attention):
  * fashion_gen_4k_retrieval_inference  (flagship; same as bench.py)
  * retrieval_inference_s512 / s256     (shipped finetune/pretrain configs)
  * pretrain_train_step_s256            (MLM+MPP+ITM train step, grad accum,
                                         measured THROUGH the async training
                                         loop: steps_per_loop batching,
                                         device-side metric accumulation)

Timing per CLAUDE.md: distinct inputs per iteration, device->host
transfer as the sync point.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _measure_inference(seq_len: int, batch: int, iters: int = 8):
    import bench

    fwd, args = bench.build("pallas", "bfloat16", batch, seq_len=seq_len)
    return bench.measure(fwd, args, batch, iters=iters)


def _measure_pretrain_step(seq_len: int = 256, batch: int = 64,
                           micro: int = 32):
    """examples/sec of the full train step, device-resident.

    K steps are chained inside one jit (lax.scan over stacked batches;
    slope between 1x and 2x reps cancels dispatch overhead).  The
    per-dispatch path through ``run_training`` is NOT timed here: the
    tunneled TPU relay in this environment round-trips the train state
    per dispatch (~11 s/step for a 111M-param state), which measures the
    tunnel, not the framework -- on directly-attached TPUs the async
    loop approaches this device-resident number.
    """
    import jax
    import jax.numpy as jnp

    from mmt_tpu.configs import (
        ClsHeadConfig,
        MmtEncoderConfig,
        MmtPretrainDataConfig,
        OptimizationConfig,
        PretrainModelConfig,
        PretrainingTaskConfig,
        TrainerConfig,
    )
    from mmt_tpu.configs.encoder import EncoderConfig
    from mmt_tpu.train.optimizer import create_optimizer
    from mmt_tpu.train.tasks import PretrainingTask
    from mmt_tpu.train.train_state import TrainState

    # Shipped pretrain geometry (BERT-base, 2D rel-attention, S=256).
    enc = MmtEncoderConfig(
        relative_att_num_core_layers=1,
        relative_vocab_size=49,
        compute_dtype="bfloat16",
        attention_impl="pallas",
    )
    n_patches = 196
    task_cfg = PretrainingTaskConfig(
        model=PretrainModelConfig(
            encoder=EncoderConfig(mmt=enc),
            cls_heads=[ClsHeadConfig(inner_dim=768, num_classes=2, name="itm")],
        ),
        train_data=MmtPretrainDataConfig(max_seq_len=seq_len),
    )
    trainer = TrainerConfig(
        train_steps=30, steps_per_loop=10, summary_interval=10,
        checkpoint_interval=10**9, validation_interval=10**9,
        micro_batch_size=micro,
    )
    task = PretrainingTask(task_cfg, trainer)

    n_mlm, n_mpp = 40, 98

    def make_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "word_ids": jnp.asarray(r.integers(0, 30000, (batch, seq_len)), jnp.int32),
            "segment_ids": jnp.asarray(
                np.where(np.arange(seq_len)[None] < n_patches + 2, 1, 2), jnp.int32
            ).repeat(batch, 0),
            "patch_embeddings": jnp.asarray(
                r.normal(size=(batch, n_patches, 768)), jnp.float32),
            "lengths": jnp.asarray(
                r.integers(seq_len // 2, seq_len + 1, (batch,)), jnp.int32),
            "mlm_positions": jnp.asarray(
                r.integers(n_patches + 2, seq_len, (batch, n_mlm)), jnp.int32),
            "mlm_label_ids": jnp.asarray(
                r.integers(0, 30000, (batch, n_mlm)), jnp.int32),
            "mlm_label_weights": jnp.ones((batch, n_mlm), jnp.float32),
            "mpp_positions": jnp.asarray(
                r.integers(2, n_patches + 2, (batch, n_mpp)), jnp.int32),
            "mpp_label_ids": jnp.asarray(
                r.integers(0, 512, (batch, n_mpp)), jnp.int32),
            "mpp_label_weights": jnp.ones((batch, n_mpp), jnp.float32),
            "itm_label_ids": jnp.asarray(r.integers(0, 2, (batch,)), jnp.int32),
            "itm_label_weights": jnp.ones((batch,), jnp.float32),
        }

    batches = [make_batch(i) for i in range(4)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    params = task.init(jax.random.PRNGKey(0), batches[0])
    tx = create_optimizer(OptimizationConfig(), train_steps=trainer.train_steps)
    state = TrainState.create(params, tx)
    step_fn = task.make_train_step(micro_batch_size=micro)

    def chain(state, stacked, reps):
        def body(st, b):
            st2, _ = step_fn(st, b, jax.random.PRNGKey(1))
            return st2, ()

        def rep(st, _):
            st, _ = jax.lax.scan(body, st, stacked)
            return st, ()

        st, _ = jax.lax.scan(rep, state, jnp.arange(reps))
        return st

    K = len(batches)
    f1 = jax.jit(lambda s, x: chain(s, x, 1))
    f2 = jax.jit(lambda s, x: chain(s, x, 2))
    np.asarray(f1(state, stacked).step)
    np.asarray(f2(state, stacked).step)

    def t(fn):
        best = 1e9
        for i in range(2):
            st = state.replace(step=state.step + i)
            xs = jax.tree.map(
                lambda x: x + 1e-6 * i if x.dtype == jnp.float32 else x,
                stacked,
            )
            t0 = time.perf_counter()
            np.asarray(fn(st, xs).step)
            best = min(best, time.perf_counter() - t0)
        return best

    per_step = (t(f2) - t(f1)) / K
    return batch / per_step


def main():
    import argparse

    import bench

    ap = argparse.ArgumentParser()
    ap.add_argument("--long", action="store_true",
                    help="also bench long-context training (4k/8k/16k; "
                         "each shape is a multi-minute compile)")
    args = ap.parse_args()

    def emit(r):
        print(json.dumps(r), flush=True)

    eps4k = _measure_inference(4096, 32, iters=8)
    base = bench.cpu_baseline()
    emit({
        "metric": "fashion_gen_4k_retrieval_inference", "value": round(eps4k, 3),
        "unit": "examples/sec", "vs_baseline": round(eps4k / base, 2),
    })
    for s, b in ((512, 256), (256, 512)):
        eps = _measure_inference(s, b, iters=8)
        emit({
            "metric": f"retrieval_inference_s{s}", "value": round(eps, 3),
            "unit": "examples/sec",
        })
    eps_train = _measure_pretrain_step()
    emit({
        "metric": "pretrain_train_step_s256", "value": round(eps_train, 3),
        "unit": "examples/sec",
    })
    if args.long:
        for s, b in ((4096, 8), (8192, 4), (16384, 2)):
            eps = _measure_pretrain_step(seq_len=s, batch=b, micro=b)
            emit({
                "metric": f"pretrain_train_step_s{s}", "value": round(eps, 3),
                "unit": "examples/sec",
                "tokens_per_sec": round(eps * s, 1),
            })


if __name__ == "__main__":
    main()
