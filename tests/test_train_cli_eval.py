"""train CLI: classification train_and_eval with AUC + best-ckpt export."""

import json
import os

import numpy as np
import yaml

from tests.test_data_pipeline import data_kwargs, make_vocab, write_records


def test_classification_train_and_eval(tmp_path):
    from mmt_tpu.cli.train import main

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
        "global_batch_size": 16,
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
                    "cls_heads": [{"inner_dim": 32, "num_classes": 2, "name": "itm"}],
                },
                "train_data": {**data_common, "input_path": train_path,
                               "is_training": True},
                "validation_data": {**data_common, "input_path": val_path,
                                    "is_training": False},
            },
            "trainer": {
                "train_steps": 4,
                "steps_per_loop": 2,
                "summary_interval": 2,
                "checkpoint_interval": 4,
                "validation_interval": 2,
                "validation_steps": 2,
                "best_checkpoint_export_subdir": "best_ckpt",
                "best_checkpoint_eval_metric": "auc",
                "best_checkpoint_metric_comp": "higher",
            },
        }
    )
    model_dir = str(tmp_path / "model")
    main([
        "--experiment=mmt/classification",
        "--mode=train_and_eval",
        f"--model_dir={model_dir}",
        f"--params_override={override}",
    ])

    # Validation summaries written with an auc value.
    val_log = os.path.join(model_dir, "validation_summaries.jsonl")
    assert os.path.exists(val_log)
    with open(val_log) as f:
        rows = [json.loads(l) for l in f]
    assert any("auc" in r for r in rows)
    assert all(0.0 <= r.get("auc", 0.0) <= 1.0 + 1e-6 for r in rows)
    # Best checkpoint exported.
    info = os.path.join(model_dir, "best_ckpt", "best_info.json")
    assert os.path.exists(info)
    with open(info) as f:
        best = json.load(f)
    assert best["metric_name"] == "auc"
