"""Training driver.

Parity surface: ``src/train.py`` flags
(--experiment/--mode/--model_dir/--config_file/--params_override) and its
control flow: resolve experiment from the registry, apply yaml + string
overrides, serialize the merged config to model_dir, build the task over
the device mesh, run the training loop (train / train_and_eval / eval).

Usage:
  python -m mmt_tpu.cli.train --experiment=mmt/pretraining \
      --mode=train_and_eval --model_dir=/tmp/model \
      --config_file=exp.yaml --params_override='trainer.train_steps=100'
"""

from __future__ import annotations

import argparse
import functools
import logging
import os

import yaml


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experiment", required=True,
                   help="registry name, e.g. mmt/pretraining")
    p.add_argument("--mode", default="train",
                   choices=["train", "train_and_eval", "eval",
                            "continuous_train_and_eval"])
    # For continuous_train_and_eval: the pretraining model_dir to watch.
    p.add_argument("--pretrain_model_dir", default="")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--config_file", action="append", default=[])
    p.add_argument("--params_override", default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--gin_file", action="append", default=[],
        help="Gin-style binding file(s): 'target.attr = value' lines "
             "(reference --gin_file, src/train.py:39-48; see "
             "mmt_tpu/utils/bindings.py for the supported subset).")
    p.add_argument(
        "--gin_params", action="append", default=[],
        help="Inline gin-style bindings, e.g. "
             "\"build_encoder.encoder_cls = @my.models.Encoder\".")
    p.add_argument(
        "--lenient_warm_start", action="store_true",
        help="Allow a partially-matching TF init_checkpoint (reference "
             "expect_partial semantics).  Off by default: a typo'd or "
             "mismatched checkpoint would otherwise silently train from "
             "fresh inits (the reference predict path asserts all "
             "objects matched, src/prediction_helper.py:192-195).",
    )
    return p.parse_args(argv)


def build_experiment_config(args):
    from mmt_tpu.configs import get_experiment_config
    from mmt_tpu.configs.base import from_yaml_file, parse_params_override

    cfg = get_experiment_config(args.experiment)
    for path in args.config_file:
        cfg = from_yaml_file(cfg, path, strict=True)
    if args.params_override:
        cfg = parse_params_override(cfg, args.params_override, strict=True)
    return cfg


def warm_start(path: str, params, strict: bool = True):
    """Warm start from an init checkpoint, auto-detecting its kind.

    * Orbax directory (ours): full params restore.
    * TF object checkpoint with word-embedding tables: full MMT
      conversion (reference ``tf.train.Checkpoint(model).read``,
      src/tasks/pretraining.py:341-351).
    * TF object checkpoint without text tables: from-ViT warm start
      (reference ``*_from_vit`` configs) -- image-relevant encoder
      params restored (with position-grid interpolation), text tables
      and heads stay fresh.
    """
    from mmt_tpu.train.checkpoint import CheckpointManager

    # Probe for TF-checkpoint markers WITHOUT importing tensorflow: the
    # Orbax path (warm start from this framework's own pretraining) must
    # work on TF-free deployments.
    def _tf_ckpt_path(p):
        if p.startswith("gs://"):
            import tensorflow as tf  # gfile needed to probe GCS

            if tf.io.gfile.isdir(p):
                return tf.train.latest_checkpoint(p)
            return p if tf.io.gfile.exists(p + ".index") else None
        if os.path.isdir(p):
            if os.path.exists(os.path.join(p, "checkpoint")):
                import tensorflow as tf

                return tf.train.latest_checkpoint(p)
            return None
        return p if os.path.exists(p + ".index") else None

    tf_path = _tf_ckpt_path(path)
    if tf_path is None:
        mgr = CheckpointManager(path)
        params = mgr.restore(template={"params": params})["params"]
        logging.info("warm-started from orbax checkpoint %s", path)
        return params

    from mmt_tpu.train.tf_checkpoint import convert_tf_checkpoint, load_tf_checkpoint
    from mmt_tpu.train.vit_checkpoint import convert_vit_checkpoint

    tf_vars = load_tf_checkpoint(tf_path)
    has_text = any("word_embedding" in k for k in tf_vars)
    if has_text:
        params = convert_tf_checkpoint(tf_vars, params, strict=strict)
        logging.info("warm-started from TF MMT checkpoint %s", tf_path)
    else:
        params = convert_vit_checkpoint(tf_vars, params)
        logging.info("warm-started from TF ViT checkpoint %s", tf_path)
    return params


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    if args.gin_file or args.gin_params:
        # Gin-style code-object bindings before any model/config build
        # (reference order: gin.parse_config_files_and_bindings first,
        # src/train.py:48).
        from mmt_tpu.utils.bindings import apply_bindings

        n = apply_bindings(args.gin_file, args.gin_params)
        logging.info("applied %d gin-style binding(s)", n)
    cfg = build_experiment_config(args)

    import jax

    # Multi-host SPMD: one process per host (replaces the reference's
    # TF_CONFIG cluster plumbing; src/distribute_utils.py:191-224).
    if os.environ.get("MMT_MULTIHOST"):
        jax.distributed.initialize()

    from mmt_tpu.configs.base import to_dict
    from mmt_tpu.configs.experiments import (
        ClassificationTaskConfig,
        PretrainingTaskConfig,
    )
    from mmt_tpu.data.loaders import (
        MmtClassificationLoader,
        MmtPretrainLoader,
    )
    from mmt_tpu.data.dummy import dummy_pretrain_batches
    from mmt_tpu.parallel import create_mesh, shard_batch
    from mmt_tpu.train.checkpoint import CheckpointManager
    from mmt_tpu.train.loop import run_training
    from mmt_tpu.train.optimizer import create_optimizer
    from mmt_tpu.train.tasks import ClassificationTask, PretrainingTask
    from mmt_tpu.train.train_state import TrainState

    os.makedirs(args.model_dir, exist_ok=True)
    # Config serialization from the chief only (multi-host: all processes
    # share model_dir; reference writes from the coordinator).
    if args.mode in ("train", "train_and_eval") and jax.process_index() == 0:
        with open(os.path.join(args.model_dir, "params.yaml"), "w") as f:
            yaml.safe_dump(to_dict(cfg), f)

    num_pipe = cfg.runtime.num_pipeline_stages
    if num_pipe > 1:
        if cfg.runtime.num_model_parallel > 1:
            raise ValueError(
                "num_pipeline_stages > 1 is mutually exclusive with "
                "num_model_parallel > 1"
            )
        from jax.sharding import Mesh
        import numpy as _np

        n_dev = len(jax.devices())
        n_data = cfg.runtime.num_data_parallel or n_dev // num_pipe
        mesh = Mesh(
            _np.asarray(jax.devices()[: n_data * num_pipe]).reshape(
                n_data, num_pipe
            ),
            ("data", "pipe"),
        )
    else:
        mesh = create_mesh(
            num_data=cfg.runtime.num_data_parallel,
            num_model=cfg.runtime.num_model_parallel,
        )
    logging.info("mesh: %s over %d devices", mesh.axis_names, mesh.devices.size)

    is_pretraining = isinstance(cfg.task, PretrainingTaskConfig)
    data_cfg = cfg.task.train_data
    # Multi-host: each process loads and feeds global/process_count
    # examples (the reference's per-replica batch derivation,
    # src/data/pretrain_dataloader.py:107-108); shard_batch assembles
    # the global array from the per-process slices.
    if cfg.task.train_data.global_batch_size % jax.process_count():
        raise ValueError(
            f"global_batch_size {cfg.task.train_data.global_batch_size} not "
            f"divisible by {jax.process_count()} processes"
        )
    local_bsz = cfg.task.train_data.global_batch_size // jax.process_count()
    if is_pretraining:
        task = PretrainingTask(cfg.task, cfg.trainer)
        if data_cfg.input_path == "dummy":
            batches = dummy_pretrain_batches(data_cfg, batch_size=local_bsz)
        elif data_cfg.num_workers > 0:
            from mmt_tpu.data.prefetch import LoaderShard, multiprocess_batches

            batches = multiprocess_batches(
                LoaderShard(MmtPretrainLoader, data_cfg, local_bsz),
                num_workers=data_cfg.num_workers,
                base_shard=jax.process_index(),
                total_shards=jax.process_count(),
            )
        else:
            # In-process loader: a checkpointable TrainStream, so resume
            # continues the input stream exactly (train/loop.py).
            batches = MmtPretrainLoader(data_cfg).stream(
                jax.process_index(), jax.process_count(),
                batch_size=local_bsz,
            )
        if num_pipe > 1:
            num_micro = cfg.runtime.num_pipeline_microbatches or max(
                1,
                cfg.task.train_data.global_batch_size
                // max(cfg.trainer.micro_batch_size, 1),
            )
            train_step = task.make_pipelined_train_step(
                mesh, num_micro, zero1=cfg.runtime.zero_sharded_optimizer
            )
        else:
            train_step = task.make_train_step(
                mesh=mesh, micro_batch_size=cfg.trainer.micro_batch_size,
                grad_accum_dtype=cfg.trainer.grad_accum_dtype,
                zero1=cfg.runtime.zero_sharded_optimizer,
            )
    else:
        assert isinstance(cfg.task, ClassificationTaskConfig)
        task = ClassificationTask(cfg.task, cfg.trainer)
        if data_cfg.num_workers > 0:
            from mmt_tpu.data.prefetch import LoaderShard, multiprocess_batches

            batches = multiprocess_batches(
                LoaderShard(MmtClassificationLoader, data_cfg, local_bsz),
                num_workers=data_cfg.num_workers,
                base_shard=jax.process_index(),
                total_shards=jax.process_count(),
            )
        else:
            batches = MmtClassificationLoader(data_cfg).stream(
                jax.process_index(), jax.process_count(),
                batch_size=local_bsz,
            )
        if num_pipe > 1:
            num_micro = cfg.runtime.num_pipeline_microbatches or 2
            train_step = task.make_pipelined_train_step(
                mesh, num_micro, zero1=cfg.runtime.zero_sharded_optimizer
            )
        else:
            train_step = task.make_train_step(
                mesh=mesh, zero1=cfg.runtime.zero_sharded_optimizer
            )

    if hasattr(batches, "state"):
        # Resumable stream: pre-pull the init batch through a wrapper
        # that keeps state()/restore() correct while it is queued.
        from mmt_tpu.data.loaders import ResumablePrefixed

        train_iter = ResumablePrefixed(batches)
        first = train_iter.prime()
    else:
        train_iter = iter(batches)
        first = next(train_iter)

        import itertools

        train_iter = itertools.chain([first], train_iter)

    # Validation (train_and_eval / eval modes).
    eval_fn = None
    val_cfg = cfg.task.validation_data
    if args.mode in ("train_and_eval", "eval", "continuous_train_and_eval") and val_cfg.input_path not in ("", "dummy"):
        import itertools as _it

        import numpy as np

        from mmt_tpu.eval.metrics_host import auc_pr

        multiproc = jax.process_count() > 1
        eval_step = task.make_eval_step(mesh=mesh if multiproc else None)
        val_loader_cls = MmtPretrainLoader if is_pretraining else MmtClassificationLoader
        max_steps = cfg.trainer.validation_steps
        if multiproc and max_steps <= 0:
            raise ValueError(
                "multi-host eval requires trainer.validation_steps > 0 "
                "(every process must dispatch the same number of steps)"
            )

        def eval_fn(state):
            sums = {}
            probs_all, labels_all, weights_all = [], [], []
            if multiproc:
                # Per-process disjoint shard; cycle if a shard runs dry so
                # every process dispatches exactly max_steps collectives.
                local = val_cfg.global_batch_size // jax.process_count()
                stream = _it.cycle(
                    val_loader_cls(val_cfg).load(
                        jax.process_index(), jax.process_count(),
                        batch_size=local,
                    )
                )
            else:
                stream = val_loader_cls(val_cfg).load()
            for step_i, batch in enumerate(stream):
                if max_steps > 0 and step_i >= max_steps:
                    break
                local_labels = batch.get("label_ids")
                local_weights = batch.get("label_weights")
                if multiproc:
                    batch = shard_batch(mesh, batch)
                out = eval_step(state.params, batch)
                metrics = out[0] if isinstance(out, tuple) else out
                for name, (total, count) in metrics.items():
                    prev = sums.get(name, (0.0, 0.0))
                    sums[name] = (prev[0] + float(total), prev[1] + float(count))
                if isinstance(out, tuple):
                    probs_all.append(np.asarray(out[1]))
                    labels_all.append(np.asarray(local_labels))
                    weights_all.append(np.asarray(local_weights))
            result = {n: (t / c if c else 0.0) for n, (t, c) in sums.items()}
            if probs_all and not is_pretraining:
                labels = np.concatenate(labels_all)
                weights = np.concatenate(weights_all)
                if multiproc:
                    # probs are already global (replicated output over the
                    # assembled batch), concatenated step-major with each
                    # step's rows process-major.  process_allgather stacks
                    # [P, n_steps * local] (process-major), so transpose to
                    # step-major before flattening or the (label, prob)
                    # pairing is scrambled for validation_steps > 1.
                    from jax.experimental import multihost_utils

                    n_steps = len(labels_all)

                    def _gather_step_major(x):
                        g = np.asarray(multihost_utils.process_allgather(x))
                        return (
                            g.reshape(g.shape[0], n_steps, -1)
                            .transpose(1, 0, 2)
                            .reshape(-1)
                        )

                    labels = _gather_step_major(labels)
                    weights = _gather_step_major(weights)
                result["auc"] = auc_pr(
                    labels, np.concatenate(probs_all).reshape(-1), weights
                )
            return result

    rng = jax.random.PRNGKey(args.seed)
    params = task.init(rng, jax.tree.map(lambda x: x, first))
    if cfg.task.init_checkpoint:
        params = warm_start(
            cfg.task.init_checkpoint, params,
            strict=not args.lenient_warm_start,
        )

    tx = create_optimizer(cfg.trainer.optimizer_config, cfg.trainer.train_steps)
    state = TrainState.create(params, tx)
    if cfg.runtime.zero_sharded_optimizer:
        from mmt_tpu.parallel.zero import shard_opt_state

        state = state.replace(opt_state=shard_opt_state(mesh, state.opt_state))

    if args.mode == "eval":
        assert eval_fn is not None, "eval mode requires validation_data.input_path"
        metrics = eval_fn(state)
        logging.info("eval: %s", metrics)
        print(metrics)
        return

    if args.mode == "continuous_train_and_eval":
        # Parity: reference --mode=continuous_train_and_eval
        # (src/train.py:57-59 -> TFM continuous_finetune_lib).
        from mmt_tpu.train.continuous import run_continuous_finetune

        assert args.pretrain_model_dir, "--pretrain_model_dir required"

        def make_state():
            p = task.init(rng, first)
            return TrainState.create(p, tx)

        results = run_continuous_finetune(
            pretrain_model_dir=args.pretrain_model_dir,
            model_dir=args.model_dir,
            make_state=make_state,
            train_step=train_step,
            train_iter_fn=lambda: batches,
            eval_fn=eval_fn,
            steps_per_checkpoint=cfg.trainer.train_steps,
            rng=rng,
            place_batch=functools.partial(shard_batch, mesh),
            timeout_s=3600.0,
        )
        logging.info("continuous finetune results: %s", results)
        return

    from mmt_tpu.train.preemption import TrainingPreempted

    try:
        run_training(
            train_step=train_step,
            state=state,
            train_iter=train_iter,
            trainer=cfg.trainer,
            model_dir=args.model_dir,
            eval_fn=eval_fn,
            rng=rng,
            place_batch=functools.partial(shard_batch, mesh),
        )
    except TrainingPreempted as e:
        # Clean exit: the checkpoint at e.step is durable and a restart
        # of this same command resumes from it.
        logging.warning("exiting after preemption checkpoint at step %d", e.step)
        return
    logging.info("training complete")


if __name__ == "__main__":
    main()
