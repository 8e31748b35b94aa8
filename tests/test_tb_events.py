"""TensorBoard event files (TF-free encoding) cross-validated against
TensorFlow's own summary_iterator, plus loop integration.

Parity surface: the reference's TFM/Orbit trainer wrote TB scalar
summaries every summary_interval steps (SURVEY §5)."""

import glob
import os

import numpy as np
import pytest

from mmt_tpu.utils.tb_events import TBEventWriter

tf = pytest.importorskip("tensorflow")


def _read_events(path):
    out = []
    for ev in tf.compat.v1.train.summary_iterator(path):
        row = {"step": ev.step, "wall_time": ev.wall_time}
        if ev.HasField("file_version"):
            row["file_version"] = ev.file_version
        if ev.HasField("summary"):
            row["scalars"] = {
                v.tag: v.simple_value for v in ev.summary.value
            }
        out.append(row)
    return out


def test_tf_reads_our_events(tmp_path):
    w = TBEventWriter(str(tmp_path / "train"))
    w.scalars(1, {"loss": 3.25, "mlm_accuracy": 0.125})
    w.scalars(200000, {"loss": -1.5e-3})
    w.close()

    events = _read_events(w.path)
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 1
    np.testing.assert_allclose(events[1]["scalars"]["loss"], 3.25)
    np.testing.assert_allclose(events[1]["scalars"]["mlm_accuracy"], 0.125)
    assert events[2]["step"] == 200000
    np.testing.assert_allclose(events[2]["scalars"]["loss"], -1.5e-3,
                               rtol=1e-6)
    assert all(e["wall_time"] > 1.7e9 for e in events)


def test_loop_writes_tb_summaries(tmp_path):
    import jax

    from mmt_tpu.configs import OptimizationConfig, TrainerConfig
    from mmt_tpu.train.loop import run_training
    from mmt_tpu.train.optimizer import create_optimizer
    from mmt_tpu.train.train_state import TrainState
    from tests.test_train import make_pretrain_task, pretrain_batch

    task = make_pretrain_task()
    batch = pretrain_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=2)
    trainer = TrainerConfig(
        train_steps=2, steps_per_loop=1, summary_interval=1,
        checkpoint_interval=2, validation_interval=1,
        tensorboard_summaries=True,
    )
    model_dir = str(tmp_path / "m")

    def eval_fn(state):
        return {"auc": 0.75}

    run_training(
        train_step=task.make_train_step(),
        state=TrainState.create(params, tx),
        train_iter=iter(lambda: batch, None), trainer=trainer,
        model_dir=model_dir, eval_fn=eval_fn, rng=jax.random.PRNGKey(0),
    )
    train_files = glob.glob(
        os.path.join(model_dir, "summaries", "train", "events.out.tfevents.*"))
    val_files = glob.glob(
        os.path.join(model_dir, "summaries", "validation",
                     "events.out.tfevents.*"))
    assert len(train_files) == 1 and len(val_files) == 1
    train_events = [e for e in _read_events(train_files[0]) if "scalars" in e]
    assert {e["step"] for e in train_events} == {1, 2}
    assert all("steps_per_sec" in e["scalars"] for e in train_events)
    val_events = [e for e in _read_events(val_files[0]) if "scalars" in e]
    assert [e["scalars"]["auc"] for e in val_events] == [0.75, 0.75]
