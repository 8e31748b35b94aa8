"""Prediction / retrieval-eval driver.

Parity surface: ``src/predict.py`` + ``src/prediction_helper.py``:
build the mmt/classification experiment, apply yaml overrides, read the
``input_meta_data`` JSON, construct the retrieval data config (paired
records or image x text cross-product), restore the checkpoint, score
all pairs, and write ``results.csv`` + ``recall.json``.

Usage:
  python -m mmt_tpu.cli.predict --config_file=exp.yaml \
      --input_meta_data_path=meta.json --predict_split=test \
      --init_checkpoint=/path/ckpt --test_output_dir=/tmp/out \
      --predict_global_batch_size=2048
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_file", action="append", default=[])
    p.add_argument("--params_override", default="")
    p.add_argument("--input_meta_data_path", required=True)
    p.add_argument("--predict_split", default="test")
    p.add_argument("--init_checkpoint", required=True)
    p.add_argument("--test_output_dir", required=True)
    p.add_argument("--predict_global_batch_size", type=int, default=2048)
    p.add_argument(
        "--export_serving_artifact", default="",
        help="write the scoring computation as a portable jax.export "
             "artifact (StableHLO, symbolic batch dim) to this path and "
             "exit without scoring; see mmt_tpu/eval/export.py")
    p.add_argument(
        "--export_bucket_sizes", default="",
        help="comma-separated batch-size buckets (e.g. '1,8,32'): write "
             "a bucketed-artifact BUNDLE instead of one artifact -- the "
             "static-batch serving story for Mosaic-kernel configs; "
             "load with mmt_tpu.eval.export.load_scoring_bundle")
    return p.parse_args(argv)


def build_retrieval_data_config(task_data_cfg, meta, split: str, batch_size: int):
    """Parity: ``src/prediction_helper.py:133-180``."""
    from mmt_tpu.configs.data import MmtRetrievalDataConfig

    common = dict(
        global_batch_size=batch_size,
        vocab_filename=task_data_cfg.vocab_filename,
        text_special_token_field_dict=task_data_cfg.text_special_token_field_dict,
        is_training=False,
        max_seq_len=meta["max_seq_length"],
        drop_remainder=False,
        include_image_text_index=True,
        relative_pos_max_distance=task_data_cfg.relative_pos_max_distance,
        relative_att_num_core_layers=task_data_cfg.relative_att_num_core_layers,
        image_size=task_data_cfg.image_size,
        patch_size=task_data_cfg.patch_size,
    )
    input_path = meta.get(f"{split}_input_path")
    if input_path is None:
        return MmtRetrievalDataConfig(
            image_input_path=meta[f"{split}_image_input_path"],
            text_input_path=meta[f"{split}_text_input_path"],
            num_image_examples=meta[f"{split}_num_image_examples"],
            num_text_examples=meta[f"{split}_num_text_examples"],
            **common,
        )
    return MmtRetrievalDataConfig(
        input_path=input_path, num_examples=meta.get(f"{split}_num_examples", 0), **common
    )


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)

    import jax

    from mmt_tpu.configs import get_experiment_config
    from mmt_tpu.configs.base import from_yaml_file, parse_params_override
    from mmt_tpu.data.loaders import MmtRetrievalLoader
    from mmt_tpu.eval.predict import predict, write_results
    from mmt_tpu.train.checkpoint import CheckpointManager
    from mmt_tpu.train.tasks import ClassificationTask

    cfg = get_experiment_config("mmt/classification")
    for path in args.config_file:
        cfg = from_yaml_file(cfg, path, strict=True)
    if args.params_override:
        cfg = parse_params_override(cfg, args.params_override, strict=True)

    with open(args.input_meta_data_path) as f:
        meta = json.load(f)

    # Sharded scoring needs batch % device_count == 0; round up rather
    # than crash (the retrieval loader pads every batch to full size with
    # a valid mask, so the extra slots cost only padding compute).
    batch_size = args.predict_global_batch_size
    n_dev = jax.device_count()
    if batch_size % n_dev:
        batch_size = ((batch_size + n_dev - 1) // n_dev) * n_dev
        logging.info(
            "rounded predict batch %d -> %d (%d devices)",
            args.predict_global_batch_size, batch_size, n_dev,
        )
    data_cfg = build_retrieval_data_config(
        cfg.task.train_data, meta, args.predict_split, batch_size
    )
    # Retrieval scoring uses the classification model at the meta seq len.
    cfg = dataclasses.replace(cfg, task=dataclasses.replace(cfg.task, train_data=data_cfg))

    task = ClassificationTask(cfg.task, cfg.trainer)
    loader = MmtRetrievalLoader(data_cfg)
    batches = loader.load()
    first = next(iter(loader.load()))
    params = task.init(jax.random.PRNGKey(0), first)

    mgr = CheckpointManager(args.init_checkpoint)
    restored = mgr.restore(template={"params": params})
    params = restored["params"]
    logging.info("restored checkpoint from %s", args.init_checkpoint)

    if args.export_serving_artifact:
        # Mosaic kernels do not lower with symbolic shapes: pallas
        # configs get static-batch artifacts.  --export_bucket_sizes
        # writes a BUNDLE (one artifact per batch-size bucket + a
        # pad-and-dispatch loader, mmt_tpu.eval.export.
        # load_scoring_bundle); otherwise one artifact, symbolic-batch
        # when the xla path allows it.
        impl = cfg.task.model.encoder.get().attention_impl
        if args.export_bucket_sizes:
            from mmt_tpu.eval.export import export_scoring_bundle

            sizes = [int(x) for x in args.export_bucket_sizes.split(",")]
            blob = export_scoring_bundle(task, params, first,
                                         batch_sizes=sizes)
        else:
            from mmt_tpu.eval.export import export_scoring

            blob = export_scoring(task, params, first,
                                  symbolic_batch=(impl != "pallas"))
        with open(args.export_serving_artifact, "wb") as f:
            f.write(blob)
        logging.info("wrote serving artifact (%d bytes) to %s",
                     len(blob), args.export_serving_artifact)
        return

    # Shard scoring over all attached chips (reference distributed
    # predict, src/tasks/classification.py:302-322).
    mesh = None
    if jax.device_count() > 1:
        from mmt_tpu.parallel import create_mesh

        mesh = create_mesh(num_data=jax.device_count(), num_model=1)
        logging.info("sharding predict over %d devices", jax.device_count())
    step = task.make_inference_step(mesh=mesh)
    results = predict(step, params, batches)
    recall = write_results(results, args.test_output_dir)
    print(json.dumps(recall, indent=2))


if __name__ == "__main__":
    main()
