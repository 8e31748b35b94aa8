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
                           micro: int = 32, steps: int = 30):
    """examples/sec through run_training (loop overhead included)."""
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
    from mmt_tpu.train.loop import run_training
    from mmt_tpu.train.optimizer import create_optimizer
    from mmt_tpu.train.tasks import PretrainingTask
    from mmt_tpu.train.train_state import TrainState
    import tempfile

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
        train_steps=steps, steps_per_loop=10, summary_interval=10,
        checkpoint_interval=10**9, validation_interval=10**9,
        micro_batch_size=micro,
    )
    task = PretrainingTask(task_cfg, trainer)

    rng = np.random.default_rng(0)
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

    batches = [make_batch(i) for i in range(8)]

    def train_iter():
        i = 0
        while True:
            yield batches[i % len(batches)]
            i += 1

    params = task.init(jax.random.PRNGKey(0), batches[0])
    tx = create_optimizer(OptimizationConfig(), train_steps=trainer.train_steps)
    state = TrainState.create(params, tx)
    step_fn = task.make_train_step(micro_batch_size=micro)

    with tempfile.TemporaryDirectory() as tmp:
        # Warm up compile + first loop window.
        state = run_training(
            train_step=step_fn, state=state, train_iter=train_iter(),
            trainer=trainer, model_dir=tmp,
        )
        t0 = time.perf_counter()
        trainer2 = TrainerConfig(
            train_steps=2 * steps, steps_per_loop=10, summary_interval=10,
            checkpoint_interval=10**9, validation_interval=10**9,
            micro_batch_size=micro,
        )
        state = run_training(
            train_step=step_fn, state=state, train_iter=train_iter(),
            trainer=trainer2, model_dir=tmp,
        )
        # run_training resumed at `steps`, so this timed `steps` more.
        dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    import bench

    results = []
    eps4k = _measure_inference(4096, 32, iters=8)
    base = bench.cpu_baseline()
    results.append({
        "metric": "fashion_gen_4k_retrieval_inference", "value": round(eps4k, 3),
        "unit": "examples/sec", "vs_baseline": round(eps4k / base, 2),
    })
    for s, b in ((512, 256), (256, 512)):
        eps = _measure_inference(s, b, iters=8)
        results.append({
            "metric": f"retrieval_inference_s{s}", "value": round(eps, 3),
            "unit": "examples/sec",
        })
    eps_train = _measure_pretrain_step()
    results.append({
        "metric": "pretrain_train_step_s256", "value": round(eps_train, 3),
        "unit": "examples/sec",
    })
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
