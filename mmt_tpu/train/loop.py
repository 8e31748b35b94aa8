"""Training controller: the loop the reference delegated to TFM/Orbit.

Re-provides ``official.core.train_lib.run_experiment`` capability
(invoked at reference ``src/train.py:79-84``): steps_per_loop batched
host logging, periodic checkpointing with resume, eval interleave,
summary writing, and best-checkpoint export -- driven by
``TrainerConfig`` fields that mirror the reference yamls.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import pickle
import time
from typing import Callable, Dict, Iterator, Optional

import jax

from mmt_tpu.configs.experiments import TrainerConfig
from mmt_tpu.train.checkpoint import BestCheckpointExporter, CheckpointManager
from mmt_tpu.train.preemption import PreemptionWatcher, TrainingPreempted
from mmt_tpu.train.train_state import TrainState

logger = logging.getLogger("mmt_tpu")


def _finalize_metrics(metric_sums: Dict) -> Dict[str, float]:
    out = {}
    for name, (total, count) in metric_sums.items():
        total, count = float(total), float(count)
        out[name] = total / count if count else 0.0
    return out


class SummaryWriter:
    """Scalar summaries: jsonl (primary, greppable) + optional
    TensorBoard event files (`utils/tb_events.py`, TF-free encoding —
    the reference's TFM trainer wrote TB scalars, SURVEY §5).

    Multi-host: only process 0 writes (all processes compute the same
    globally-reduced metric values)."""

    def __init__(self, log_dir: str, name: str, tensorboard: bool = False):
        self._enabled = jax.process_index() == 0
        if self._enabled:
            os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, f"{name}_summaries.jsonl")
        self._tb = None
        if self._enabled and tensorboard:
            from mmt_tpu.utils.tb_events import TBEventWriter

            self._tb = TBEventWriter(os.path.join(log_dir, "summaries", name))

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        if not self._enabled:
            return
        with open(self._path, "a") as f:
            f.write(json.dumps({"step": step, **metrics}) + "\n")
        if self._tb is not None:
            self._tb.scalars(step, metrics)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
            self._tb = None


def _stream_state_path(model_dir: str, step: int) -> str:
    return os.path.join(
        model_dir, "data_stream", f"step_{step}_p{jax.process_index()}.pkl"
    )


def _save_stream_state(model_dir: str, step: int, train_iter) -> None:
    """Persists the input-stream position next to the model checkpoint
    (per process: each owns its shard's stream).  No-op for iterators
    without a ``state()`` surface (dummy data, multiprocess prefetch)."""
    if not hasattr(train_iter, "state"):
        return
    path = _stream_state_path(model_dir, step)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(train_iter.state(), f)
    os.replace(tmp, path)
    # Keep the two most recent snapshots for this process.
    suffix = f"_p{jax.process_index()}.pkl"
    steps = sorted(
        int(name[len("step_"):-len(suffix)])
        for name in os.listdir(os.path.dirname(path))
        if name.startswith("step_") and name.endswith(suffix)
    )
    for old in steps[:-2]:
        try:
            os.remove(_stream_state_path(model_dir, old))
        except OSError:
            pass


def _restore_stream_state(model_dir: str, step: int, train_iter) -> None:
    """Fast-forwards ``train_iter`` to where it was at ``step``'s save.

    Without a snapshot (older checkpoints, multiprocess loaders) the
    stream restarts at epoch 0 -- the reference's own behavior (TFM
    never checkpointed tf.data iterators); with one, the resumed run
    consumes exactly the batches the uninterrupted run would have."""
    if not hasattr(train_iter, "restore"):
        return
    path = _stream_state_path(model_dir, step)
    if not os.path.exists(path):
        logger.warning(
            "no input-stream snapshot for step %d: the stream restarts "
            "from epoch 0 (early batches replay)", step)
        return
    with open(path, "rb") as f:
        train_iter.restore(pickle.load(f))
    logger.info("input stream resumed at step %d (no replay)", step)


def run_training(
    *,
    train_step: Callable,
    state: TrainState,
    train_iter: Iterator,
    trainer: TrainerConfig,
    model_dir: str,
    eval_fn: Optional[Callable[[TrainState], Dict[str, float]]] = None,
    rng: Optional[jax.Array] = None,
    place_batch: Callable = lambda b: b,
    preemption_watcher: Optional[PreemptionWatcher] = None,
) -> TrainState:
    """Runs the full training loop; returns the final state.

    Args:
      train_step: jitted (state, batch, rng) -> (state, metric_sums).
      train_iter: yields host batches.
      eval_fn: optional callable running validation; returns metrics dict.
      place_batch: device placement fn (e.g. ``shard_batch`` partial).
      preemption_watcher: injected watcher (tests/embedding); by default
        one is created when ``trainer.save_on_preemption`` is set.

    Raises:
      TrainingPreempted: a preemption signal arrived and the state was
        checkpointed -- restart resumes from ``exc.step``.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # Async saves overlap Orbax serialization/IO with the next training
    # window; the wait before returning guarantees the final checkpoint
    # is durable for the predict/eval flows that read it back.
    ckpt = CheckpointManager(
        model_dir, max_to_keep=trainer.max_to_keep,
        async_save=trainer.async_checkpointing,
    )
    writer = SummaryWriter(model_dir, "train",
                           tensorboard=trainer.tensorboard_summaries)
    val_writer = None
    best = None
    if trainer.best_checkpoint_export_subdir and trainer.best_checkpoint_eval_metric:
        best = BestCheckpointExporter(
            os.path.join(model_dir, trainer.best_checkpoint_export_subdir),
            trainer.best_checkpoint_eval_metric,
            trainer.best_checkpoint_metric_comp,
        )

    start_step = int(state.step)
    latest = ckpt.latest_step()
    if latest is not None and latest > start_step:
        restored = ckpt.restore(
            latest, template={"params": state.params, "opt_state": state.opt_state}
        )
        state = state.replace(
            step=jax.numpy.asarray(latest, jax.numpy.int32),
            params=restored["params"],
            opt_state=restored["opt_state"],
        )
        start_step = latest
        logger.info("resumed from checkpoint at step %d", latest)
        _restore_stream_state(model_dir, latest, train_iter)

    # Metric accumulation stays ON DEVICE between loop boundaries: the
    # (total, count) pairs are jax arrays and the additions below enqueue
    # asynchronously, so the host never blocks mid-window and XLA keeps
    # the step pipeline full (the reference's steps_per_loop design;
    # fetching per step was measured to cap steps/sec on real TPU).
    window_metrics: Dict = {}
    watcher = preemption_watcher
    if watcher is None and trainer.save_on_preemption:
        watcher = PreemptionWatcher()
    with (watcher if watcher is not None else contextlib.nullcontext()):
        t_loop = time.perf_counter()
        for step_idx in range(start_step, trainer.train_steps):
            batch = place_batch(next(train_iter))
            state, metric_sums = train_step(
                state, batch, jax.random.fold_in(rng, step_idx))
            for name, pair in metric_sums.items():
                prev = window_metrics.get(name)
                window_metrics[name] = pair if prev is None else (
                    prev[0] + pair[0], prev[1] + pair[1]
                )

            step = step_idx + 1
            at_boundary = (
                step % trainer.steps_per_loop == 0 or step == trainer.train_steps
            )
            if at_boundary:
                # The float() conversions in _finalize_metrics are the one
                # device->host sync point of the window.
                finalized = _finalize_metrics(window_metrics)
                dt = time.perf_counter() - t_loop
                finalized["steps_per_sec"] = trainer.steps_per_loop / dt
                logger.info("step %d: %s", step, finalized)
                window_metrics = {}
                t_loop = time.perf_counter()
                if step % trainer.summary_interval == 0 or step == trainer.train_steps:
                    writer.write(step, finalized)

            if step % trainer.checkpoint_interval == 0 or step == trainer.train_steps:
                # jax.Arrays go to Orbax directly: each process writes its
                # addressable shards (required for ZeRO-1 sharded moments on
                # multi-host, where a device_get of a non-fully-addressable
                # array would throw), and the async saver's device->host
                # copy happens before the next step can donate the buffers.
                ckpt.save(step, state.params, state.opt_state)
                _save_stream_state(model_dir, step, train_iter)

            if eval_fn is not None and (
                step % trainer.validation_interval == 0 or step == trainer.train_steps
            ):
                eval_metrics = eval_fn(state)
                if val_writer is None:
                    val_writer = SummaryWriter(
                        model_dir, "validation",
                        tensorboard=trainer.tensorboard_summaries)
                val_writer.write(step, eval_metrics)
                logger.info("eval @ %d: %s", step, eval_metrics)
                if best is not None:
                    best.maybe_export(step, eval_metrics,
                                      jax.device_get(state.params))

            if (watcher is not None and step != trainer.train_steps
                    and watcher.should_save(at_boundary)):
                if step % trainer.checkpoint_interval != 0:
                    ckpt.save(step, state.params, state.opt_state)
                    _save_stream_state(model_dir, step, train_iter)
                ckpt.wait_until_finished()
                writer.close()
                if val_writer is not None:
                    val_writer.close()
                logger.warning(
                    "preempted at step %d: checkpoint durable, exiting "
                    "(restart resumes here)", step)
                raise TrainingPreempted(step)

    ckpt.wait_until_finished()
    writer.close()
    if val_writer is not None:
        val_writer.close()
    return state
