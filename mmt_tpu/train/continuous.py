"""Continuous finetuning: watch a pretraining dir, finetune each checkpoint.

Parity surface: the reference's ``--mode=continuous_train_and_eval``
(``src/train.py:57-59`` delegating to TFM ``continuous_finetune_lib``):
poll a pretraining model_dir for new checkpoints; for each one, restore
the encoder (+ matched heads) into the finetune model, train for the
configured number of steps, evaluate, and record the result keyed by the
pretrain step.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Optional, Set

from mmt_tpu.train.checkpoint import CheckpointManager, restore_encoder_and_heads

logger = logging.getLogger("mmt_tpu")


def run_continuous_finetune(
    *,
    pretrain_model_dir: str,
    model_dir: str,
    make_state: Callable[[], "object"],
    train_step: Callable,
    train_iter_fn: Callable[[], "object"],
    eval_fn: Optional[Callable],
    steps_per_checkpoint: int,
    rng,
    place_batch: Callable = lambda b: b,
    poll_interval_s: float = 10.0,
    timeout_s: float = 0.0,
    stop_after: int = 0,
) -> Dict[int, Dict[str, float]]:
    """Returns {pretrain_step: eval_metrics} for every checkpoint seen.

    ``make_state`` builds a fresh TrainState (fresh head init each round,
    as the reference does); ``stop_after`` bounds the number of rounds
    (0 = run until ``timeout_s`` of no new checkpoints).
    """
    import jax

    pretrain_ckpt = CheckpointManager(pretrain_model_dir)
    seen: Set[int] = set()
    results: Dict[int, Dict[str, float]] = {}
    deadline = time.time() + timeout_s if timeout_s else None
    os.makedirs(model_dir, exist_ok=True)

    while True:
        step = pretrain_ckpt.latest_step()
        if step is None or step in seen:
            if stop_after and len(seen) >= stop_after:
                break
            if deadline and time.time() > deadline:
                break
            if not timeout_s and not stop_after:
                break
            time.sleep(poll_interval_s)
            continue
        seen.add(step)
        logger.info("continuous finetune: pretrain checkpoint %d", step)

        state = make_state()
        restored = pretrain_ckpt.restore(
            step, template={"params": jax.device_get(state.params)}
        )
        merged = restore_encoder_and_heads(state.params, restored["params"])
        state = state.replace(params=merged)

        train_iter = iter(train_iter_fn())
        for i in range(steps_per_checkpoint):
            batch = place_batch(next(train_iter))
            state, metrics = train_step(state, batch, jax.random.fold_in(rng, i))

        eval_metrics = eval_fn(state) if eval_fn else {}
        eval_metrics["pretrain_step"] = step
        results[step] = eval_metrics
        with open(os.path.join(model_dir, "continuous_results.jsonl"), "a") as f:
            f.write(json.dumps(eval_metrics) + "\n")
        logger.info("continuous finetune @ %d: %s", step, eval_metrics)

        if stop_after and len(seen) >= stop_after:
            break
    return results
