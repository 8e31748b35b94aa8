"""Training-loop resume + continuous finetune tests."""

import json
import os

import jax
import numpy as np

from mmt_tpu.configs import OptimizationConfig, TrainerConfig
from mmt_tpu.train.checkpoint import CheckpointManager
from mmt_tpu.train.continuous import run_continuous_finetune
from mmt_tpu.train.loop import run_training
from mmt_tpu.train.optimizer import create_optimizer
from mmt_tpu.train.train_state import TrainState
from tests.test_train import make_pretrain_task, pretrain_batch


def _infinite(batch):
    while True:
        yield batch


def test_resume_from_checkpoint(tmp_path):
    task = make_pretrain_task()
    batch = pretrain_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=6)
    trainer = TrainerConfig(
        train_steps=3, steps_per_loop=1, summary_interval=1,
        checkpoint_interval=1, validation_interval=1000,
    )
    model_dir = str(tmp_path / "m")
    step = task.make_train_step()
    state = TrainState.create(params, tx)
    state = run_training(
        train_step=step, state=state, train_iter=_infinite(batch),
        trainer=trainer, model_dir=model_dir, rng=jax.random.PRNGKey(0),
    )
    assert int(state.step) == 3
    assert CheckpointManager(model_dir).latest_step() == 3

    # Fresh state resumes from step 3 and trains to 6.
    params2 = task.init(jax.random.PRNGKey(0), pretrain_batch())
    state2 = TrainState.create(params2, tx)
    trainer6 = trainer.replace(train_steps=6)
    state2 = run_training(
        train_step=task.make_train_step(), state=state2,
        train_iter=_infinite(batch), trainer=trainer6, model_dir=model_dir,
        rng=jax.random.PRNGKey(0),
    )
    assert int(state2.step) == 6
    # Resumed params match continued training (same data/rng stream):
    # at minimum the checkpoint at 6 exists and differs from 3.
    mgr = CheckpointManager(model_dir)
    assert mgr.latest_step() == 6


def test_continuous_finetune(tmp_path):
    task = make_pretrain_task()
    batch = pretrain_batch()
    tx = create_optimizer(OptimizationConfig(), train_steps=10)

    # Fake "pretraining" checkpoints at steps 1 and 2.
    pre_dir = str(tmp_path / "pretrain")
    params = task.init(jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(pre_dir)
    mgr.save(1, jax.device_get(params))
    mgr.save(2, jax.device_get(params))

    evals = []

    def make_state():
        p = task.init(jax.random.PRNGKey(1), batch)
        return TrainState.create(p, tx)

    def eval_fn(state):
        _, (_, metrics) = task.compute_loss(state.params, batch, None, True)
        evals.append(1)
        return {"mlm_loss": float(metrics["mlm_loss"][0])}

    results = run_continuous_finetune(
        pretrain_model_dir=pre_dir,
        model_dir=str(tmp_path / "ft"),
        make_state=make_state,
        train_step=task.make_train_step(),
        train_iter_fn=lambda: _infinite(batch),
        eval_fn=eval_fn,
        steps_per_checkpoint=2,
        rng=jax.random.PRNGKey(2),
        stop_after=1,
        poll_interval_s=0.01,
    )
    assert len(results) == 1 and len(evals) == 1
    (step, metrics), = results.items()
    assert step == 2  # latest checkpoint picked up
    log = os.path.join(tmp_path, "ft", "continuous_results.jsonl")
    with open(log) as f:
        rows = [json.loads(l) for l in f]
    assert rows[0]["pretrain_step"] == 2
