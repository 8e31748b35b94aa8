"""Preemption-safe training: SIGTERM -> final checkpoint -> resumable.

TPU-native aux subsystem (no in-tree reference counterpart; the
reference loses up to checkpoint_interval steps on a reclaimed VM --
SURVEY §5 recovery = restart-and-resume from the last periodic save).
"""

import os
import signal

import jax
import pytest

from mmt_tpu.configs import OptimizationConfig, TrainerConfig
from mmt_tpu.train.checkpoint import CheckpointManager
from mmt_tpu.train.loop import run_training
from mmt_tpu.train.optimizer import create_optimizer
from mmt_tpu.train.preemption import PreemptionWatcher, TrainingPreempted
from mmt_tpu.train.train_state import TrainState
from tests.test_train import make_pretrain_task, pretrain_batch


def _iter_with_sigterm_after(batch, n):
    """Yields batches; delivers a real SIGTERM to this process before the
    (n+1)-th batch (the loop's handler must already be installed)."""
    i = 0
    while True:
        if i == n:
            os.kill(os.getpid(), signal.SIGTERM)
        yield batch
        i += 1


def test_sigterm_checkpoints_and_raises(tmp_path):
    task = make_pretrain_task()
    batch = pretrain_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=50)
    # checkpoint_interval 100 >> train_steps: only the preemption save
    # can produce a checkpoint.
    trainer = TrainerConfig(
        train_steps=50, steps_per_loop=1, summary_interval=100,
        checkpoint_interval=100, validation_interval=1000,
    )
    model_dir = str(tmp_path / "m")
    state = TrainState.create(params, tx)
    with pytest.raises(TrainingPreempted) as exc:
        run_training(
            train_step=task.make_train_step(), state=state,
            train_iter=_iter_with_sigterm_after(batch, 2), trainer=trainer,
            model_dir=model_dir, rng=jax.random.PRNGKey(0),
        )
    # Signal lands before batch 3 => the step that consumes it (step 3)
    # completes, saves, and the loop exits.
    assert exc.value.step == 3
    assert CheckpointManager(model_dir).latest_step() == 3
    # The loop restored the original handler on exit.
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    # Restart resumes from the preemption checkpoint and completes.
    params2 = task.init(jax.random.PRNGKey(0), batch)
    state2 = TrainState.create(params2, tx)
    done = run_training(
        train_step=task.make_train_step(), state=state2,
        train_iter=iter(lambda: batch, None), trainer=trainer.replace(train_steps=5),
        model_dir=model_dir, rng=jax.random.PRNGKey(0),
    )
    assert int(done.step) == 5
    assert CheckpointManager(model_dir).latest_step() == 5


def test_save_on_preemption_off(tmp_path):
    task = make_pretrain_task()
    batch = pretrain_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=3)
    trainer = TrainerConfig(
        train_steps=2, steps_per_loop=1, summary_interval=100,
        checkpoint_interval=2, validation_interval=1000,
        save_on_preemption=False,
    )
    state = TrainState.create(params, tx)
    prev = signal.getsignal(signal.SIGTERM)
    done = run_training(
        train_step=task.make_train_step(), state=state,
        train_iter=iter(lambda: batch, None), trainer=trainer,
        model_dir=str(tmp_path / "m"), rng=jax.random.PRNGKey(0),
    )
    assert int(done.step) == 2
    # No handler was installed at any point we can observe afterwards.
    assert signal.getsignal(signal.SIGTERM) == prev


def test_injected_watcher_trigger(tmp_path):
    """Programmatic trigger path (embedding runtimes / multihost tests)."""
    task = make_pretrain_task()
    batch = pretrain_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=10)
    trainer = TrainerConfig(
        train_steps=10, steps_per_loop=1, summary_interval=100,
        checkpoint_interval=100, validation_interval=1000,
    )
    watcher = PreemptionWatcher()

    def gen():
        i = 0
        while True:
            if i == 1:
                watcher.trigger()
            yield batch
            i += 1

    state = TrainState.create(params, tx)
    with pytest.raises(TrainingPreempted) as exc:
        run_training(
            train_step=task.make_train_step(), state=state, train_iter=gen(),
            trainer=trainer, model_dir=str(tmp_path / "m"),
            rng=jax.random.PRNGKey(0), preemption_watcher=watcher,
        )
    assert exc.value.step == 2
    assert CheckpointManager(str(tmp_path / "m")).latest_step() == 2


def test_no_preemption_at_final_step(tmp_path):
    """A signal arriving on the last step exits through the normal
    completion path (final checkpoint is written anyway)."""
    task = make_pretrain_task()
    batch = pretrain_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=2)
    trainer = TrainerConfig(
        train_steps=2, steps_per_loop=1, summary_interval=100,
        checkpoint_interval=100, validation_interval=1000,
    )
    state = TrainState.create(params, tx)
    done = run_training(
        train_step=task.make_train_step(), state=state,
        train_iter=_iter_with_sigterm_after(batch, 1), trainer=trainer,
        model_dir=str(tmp_path / "m"), rng=jax.random.PRNGKey(0),
    )
    assert int(done.step) == 2
    assert CheckpointManager(str(tmp_path / "m")).latest_step() == 2


class _FakeResumableStream:
    """TrainStream-shaped counter stream: records how many batches were
    consumed and what position a restore landed on.  The batch-level
    exactness of the real TrainStream is pinned in test_data_resume.py;
    these tests pin the LOOP's save/restore wiring."""

    def __init__(self, batch):
        self.batch = batch
        self.i = 0
        self.restored_to = None

    def __iter__(self):
        return self

    def __next__(self):
        self.i += 1
        return self.batch

    def state(self):
        return {"i": self.i}

    def restore(self, st):
        self.i = st["i"]
        self.restored_to = st["i"]


def test_resume_continues_input_stream_exactly(tmp_path):
    """VERDICT r3 #5: the resumed run consumes exactly the batches the
    uninterrupted run would have -- no replay of early batches."""
    task = make_pretrain_task()
    batch = pretrain_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=8)
    trainer = TrainerConfig(
        train_steps=5, steps_per_loop=1, summary_interval=100,
        checkpoint_interval=2, validation_interval=1000,
    )
    model_dir = str(tmp_path / "m")
    state = TrainState.create(params, tx)
    s1 = _FakeResumableStream(batch)
    run_training(
        train_step=task.make_train_step(), state=state, train_iter=s1,
        trainer=trainer, model_dir=model_dir, rng=jax.random.PRNGKey(0),
    )
    assert s1.i == 5  # one batch per step
    # Snapshots exist beside the checkpoints (latest two kept).
    sdir = os.path.join(model_dir, "data_stream")
    assert sorted(os.listdir(sdir)) == ["step_4_p0.pkl", "step_5_p0.pkl"]

    # "Restart": fresh state + fresh stream; extend to 8 steps.
    params2 = task.init(jax.random.PRNGKey(0), batch)
    state2 = TrainState.create(params2, tx)
    s2 = _FakeResumableStream(batch)
    done = run_training(
        train_step=task.make_train_step(), state=state2, train_iter=s2,
        trainer=trainer.replace(train_steps=8),
        model_dir=model_dir, rng=jax.random.PRNGKey(0),
    )
    assert int(done.step) == 8
    assert s2.restored_to == 5      # fast-forwarded, not replayed
    assert s2.i == 8                # consumed exactly batches 6, 7, 8


def test_preemption_save_includes_stream_state(tmp_path):
    task = make_pretrain_task()
    batch = pretrain_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=50)
    trainer = TrainerConfig(
        train_steps=50, steps_per_loop=1, summary_interval=100,
        checkpoint_interval=100, validation_interval=1000,
    )
    model_dir = str(tmp_path / "m")
    state = TrainState.create(params, tx)

    class _SignalStream(_FakeResumableStream):
        def __next__(self):
            if self.i == 2:
                os.kill(os.getpid(), signal.SIGTERM)
            return super().__next__()

    s = _SignalStream(batch)
    with pytest.raises(TrainingPreempted) as exc:
        run_training(
            train_step=task.make_train_step(), state=state, train_iter=s,
            trainer=trainer, model_dir=model_dir, rng=jax.random.PRNGKey(0),
        )
    step = exc.value.step
    assert os.path.exists(
        os.path.join(model_dir, "data_stream", f"step_{step}_p0.pkl"))

    # Resume: the stream restores to the preemption point.
    params2 = task.init(jax.random.PRNGKey(0), batch)
    state2 = TrainState.create(params2, tx)
    s2 = _FakeResumableStream(batch)
    run_training(
        train_step=task.make_train_step(), state=state2, train_iter=s2,
        trainer=trainer.replace(train_steps=step + 2),
        model_dir=model_dir, rng=jax.random.PRNGKey(0),
    )
    assert s2.restored_to == step
    assert s2.i == step + 2
