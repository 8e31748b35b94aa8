"""True multi-process training: a 2-process jax.distributed cluster.

Re-provides (and actually exercises) the capability of the reference's
multi-worker launch (``src/distribute_utils.py:191-224`` TF_CONFIG
cluster config + MultiWorkerMirroredStrategy): two OS processes with 2
local CPU devices each form a 4-device global mesh, each feeds its
per-process slice of the global batch (``shard_batch`` assembles via
``make_array_from_process_local_data``), and the SPMD train step runs
identically on both.  Checkpoint + summaries are written once.
"""

import json
import math
import os
import socket
import subprocess
import sys

import yaml

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_OVERRIDE = {
    "task": {
        "model": {
            "encoder": {
                "mmt": {
                    "vocab_size": 40,
                    "hidden_size": 32,
                    "num_hidden_layers": 1,
                    "num_attention_heads": 2,
                    "intermediate_size": 64,
                    "relative_pos_max_distance": 3,
                    "relative_vocab_size": 12,
                    "relative_att_num_core_layers": 1,
                    "compute_dtype": "float32",
                    "hidden_dropout_prob": 0.0,
                    "attention_probs_dropout_prob": 0.0,
                }
            },
            "cls_heads": [{"inner_dim": 32, "num_classes": 2, "name": "itm"}],
        },
        "train_data": {
            "input_path": "dummy",
            "image_size": 32,
            "patch_size": 16,
            "max_seq_len": 32,
            "global_batch_size": 8,
            "mlm_max_selections_per_seq": 4,
            "mpp_max_selections_per_seq": 4,
        },
    },
    "trainer": {
        "train_steps": 3,
        "steps_per_loop": 1,
        "summary_interval": 1,
        "checkpoint_interval": 3,
        "validation_interval": 100,
    },
}

_SCRIPT = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, model_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(
    coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2, jax.local_devices()
assert jax.device_count() == 4, jax.devices()

from mmt_tpu.cli.train import main
main([
    "--experiment=mmt/pretraining",
    "--mode=train",
    "--model_dir=" + model_dir,
    "--params_override=" + sys.argv[4],
])
print("PROC_OK", pid)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    # zero_sharded_optimizer: the Adam moments live sharded across the
    # two processes, and the checkpoint save at step 3 persists the
    # non-fully-addressable arrays through Orbax's collective path.
    port = str(_free_port())
    model_dir = str(tmp_path / "model")
    override = yaml.safe_dump(
        {**_OVERRIDE, "runtime": {"zero_sharded_optimizer": True}}
    )
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=_ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SCRIPT, str(i), port, model_dir, override],
            env=env, cwd=_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"PROC_OK {i}" in out

    # Chief-only artifacts, written once.
    assert os.path.exists(os.path.join(model_dir, "params.yaml"))
    with open(os.path.join(model_dir, "train_summaries.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert [r["step"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert math.isfinite(r["total_loss"]), r
    # Collective checkpoint save at step 3 landed.
    assert os.path.isdir(os.path.join(model_dir, "3"))


_TP_SCRIPT = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, model_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
nproc = int(sys.argv[5])
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:" + port, num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
assert jax.device_count() == 8, jax.devices()

from mmt_tpu.cli.train import main
main([
    "--experiment=mmt/pretraining",
    "--mode=train",
    "--model_dir=" + model_dir,
    "--params_override=" + sys.argv[4],
])
print("PROC_OK", pid)
"""


def test_four_process_cross_process_model_axis(tmp_path):
    """4 processes x 2 local devices; mesh ('data'=2, 'model'=4): the
    model axis SPANS process boundaries (each process holds 2 of the 8
    devices, a model-axis row covers 2 processes) -- the layout a real
    v5e pod slice uses.  Losses must equal the single-process 8-device
    run bit-for-bit (same dummy data, same seed, same mesh shape).
    Matches src/distribute_utils.py:191-224 (multi-worker cluster)."""
    override = yaml.safe_dump({
        **_OVERRIDE,
        "runtime": {"num_data_parallel": 2, "num_model_parallel": 4},
    })

    def run(nproc, model_dir, local_devices):
        port = str(_free_port())
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                f"--xla_force_host_platform_device_count={local_devices}"
            ),
            PYTHONPATH=_ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _TP_SCRIPT, str(i), port, model_dir,
                 override, str(nproc)],
                env=env, cwd=_ROOT,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for i in range(nproc)
        ]
        outs = [p.communicate(timeout=900)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"process {i}/{nproc} failed:\n{out}"
        with open(os.path.join(model_dir, "train_summaries.jsonl")) as f:
            return [json.loads(line) for line in f]

    rows_mp = run(4, str(tmp_path / "mp"), local_devices=2)
    rows_sp = run(1, str(tmp_path / "sp"), local_devices=8)

    assert [r["step"] for r in rows_mp] == [1, 2, 3]
    assert [r["step"] for r in rows_sp] == [1, 2, 3]
    for a, b in zip(rows_mp, rows_sp):
        assert math.isfinite(a["total_loss"])
        assert a["total_loss"] == b["total_loss"], (a, b)


_CLS_SCRIPT = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, model_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(
    coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
)
from mmt_tpu.cli.train import main
main([
    "--experiment=mmt/classification",
    "--mode=train_and_eval",
    "--model_dir=" + model_dir,
    "--params_override=" + sys.argv[4],
])
print("PROC_OK", pid)
"""


def test_two_process_train_and_eval(tmp_path):
    """Multi-host eval: per-process validation shards assembled into
    global arrays, replicated metrics/probs, gathered AUC inputs."""
    import numpy as np

    from tests.test_data_pipeline import make_vocab, write_records

    rng = np.random.default_rng(0)
    vocab = make_vocab(tmp_path)
    train_path = write_records(str(tmp_path / "train.tfrecord"), 24, rng)
    val_path = write_records(str(tmp_path / "val.tfrecord"), 16, rng)

    data_common = {
        "vocab_filename": vocab,
        "image_size": 32,
        "patch_size": 16,
        "max_seq_len": 32,
        "min_shift": 2,
        "global_batch_size": 24,
    }
    override = yaml.safe_dump(
        {
            "task": {
                "model": {
                    "encoder": {
                        "mmt": {
                            "vocab_size": 40,
                            "hidden_size": 32,
                            "num_hidden_layers": 1,
                            "num_attention_heads": 2,
                            "intermediate_size": 64,
                            "relative_pos_max_distance": 3,
                            "relative_vocab_size": 12,
                            "relative_att_num_core_layers": 1,
                            "compute_dtype": "float32",
                            "hidden_dropout_prob": 0.0,
                            "attention_probs_dropout_prob": 0.0,
                        }
                    },
                    "num_classes": 2,
                    "cls_heads": [
                        {"inner_dim": 32, "num_classes": 2, "name": "itm"}
                    ],
                },
                "train_data": {**data_common, "input_path": train_path,
                               "is_training": True},
                "validation_data": {**data_common, "input_path": val_path,
                                    "is_training": False},
            },
            "trainer": {
                "train_steps": 2,
                "steps_per_loop": 1,
                "summary_interval": 1,
                "checkpoint_interval": 2,
                "validation_interval": 2,
                "validation_steps": 1,
            },
        }
    )
    port = str(_free_port())
    model_dir = str(tmp_path / "model")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=_ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CLS_SCRIPT, str(i), port, model_dir, override],
            env=env, cwd=_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"

    with open(os.path.join(model_dir, "validation_summaries.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert rows and any("auc" in r for r in rows)
    for r in rows:
        assert math.isfinite(r["total_loss"])


_PREEMPT_SCRIPT = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, model_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(
    coordinator_address="127.0.0.1:" + port, num_processes=2, process_id=pid
)

# Deterministic preemption: the "signal" lands on process 0 only, right
# before its step-2 boundary check; process 1 never flags locally and
# must still join the collective save via the cross-process OR.
import mmt_tpu.train.loop as loop
_Real = loop.PreemptionWatcher

class ScriptedWatcher(_Real):
    calls = 0
    def should_save(self, at_boundary):
        ScriptedWatcher.calls += 1
        if pid == 0 and ScriptedWatcher.calls == 2:
            self.trigger()
        return super().should_save(at_boundary)

loop.PreemptionWatcher = ScriptedWatcher

from mmt_tpu.cli.train import main
main([
    "--experiment=mmt/pretraining",
    "--mode=train",
    "--model_dir=" + model_dir,
    "--params_override=" + sys.argv[4],
])
print("PROC_OK", pid)
"""


def test_two_process_preemption_collective_save(tmp_path):
    """A preemption signal on ONE process checkpoints the whole fleet:
    process 1 (never signaled) joins the collective Orbax save at the
    same step and both exit cleanly through the CLI's TrainingPreempted
    handler."""
    port = str(_free_port())
    model_dir = str(tmp_path / "model")
    override = yaml.safe_dump({
        **_OVERRIDE,
        "trainer": {**_OVERRIDE["trainer"], "train_steps": 5,
                    "checkpoint_interval": 5},
    })
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=_ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _PREEMPT_SCRIPT, str(i), port, model_dir,
             override],
            env=env, cwd=_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"PROC_OK {i}" in out
        assert "preempted at step 2" in out, out
    # The collective preemption checkpoint landed at step 2 (the periodic
    # interval of 5 was never reached) and training stopped there.
    assert os.path.isdir(os.path.join(model_dir, "2"))
    with open(os.path.join(model_dir, "train_summaries.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert [r["step"] for r in rows] == [1, 2]
