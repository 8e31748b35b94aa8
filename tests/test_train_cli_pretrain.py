"""train CLI: pretraining (MLM+MPP+ITM) end-to-end on real records."""

import json
import os

import numpy as np
import yaml

from tests.test_data_pipeline import data_kwargs, make_vocab, write_records


def test_pretraining_on_records(tmp_path):
    from mmt_tpu.cli.train import main

    rng = np.random.default_rng(3)
    vocab = make_vocab(tmp_path)
    train_path = write_records(str(tmp_path / "pre.tfrecord"), 30, rng)

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
                    "cls_heads": [
                        {"inner_dim": 32, "num_classes": 2, "name": "itm"}
                    ],
                },
                "train_data": {
                    "vocab_filename": vocab,
                    "input_path": train_path,
                    "image_size": 32,
                    "patch_size": 16,
                    "max_seq_len": 32,
                    "min_shift": 2,
                    "global_batch_size": 16,
                    "tasks": "mlm,mpp,itm",
                    "mlm_max_selections_per_seq": 8,
                    "mpp_max_selections_per_seq": 4,
                    "min_text_wordpieces": 3,
                },
            },
            "trainer": {
                "train_steps": 3,
                "steps_per_loop": 1,
                "summary_interval": 1,
                "checkpoint_interval": 3,
                "validation_interval": 100,
                "micro_batch_size": 8,  # exercises grad accumulation
            },
        }
    )
    model_dir = str(tmp_path / "model")
    main([
        "--experiment=mmt/pretraining",
        "--mode=train",
        f"--model_dir={model_dir}",
        f"--params_override={override}",
    ])
    with open(os.path.join(model_dir, "train_summaries.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    # All pretraining losses present and finite.
    for key in ("total_loss", "mlm_loss", "mpp_loss", "itm_loss",
                "mlm_accuracy", "mpp_accuracy", "itm_accuracy"):
        assert key in rows[-1], rows[-1]
        assert np.isfinite(rows[-1][key])
    assert rows[-1]["total_loss"] > 0
    from mmt_tpu.train.checkpoint import CheckpointManager

    assert CheckpointManager(model_dir).latest_step() == 3


def test_pretraining_pipelined_cli(tmp_path):
    """runtime.num_pipeline_stages routes training through the GPipe
    pipelined step (('data','pipe') mesh) from the CLI."""
    from mmt_tpu.cli.train import main

    rng = np.random.default_rng(4)
    vocab = make_vocab(tmp_path)
    train_path = write_records(str(tmp_path / "pre.tfrecord"), 30, rng)

    override = yaml.safe_dump(
        {
            "runtime": {"num_pipeline_stages": 4, "num_pipeline_microbatches": 2},
            "task": {
                "model": {
                    "encoder": {
                        "mmt": {
                            "vocab_size": 40,
                            "hidden_size": 32,
                            "num_hidden_layers": 4,
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
                    "cls_heads": [
                        {"inner_dim": 32, "num_classes": 2, "name": "itm"}
                    ],
                },
                "train_data": {
                    "vocab_filename": vocab,
                    "input_path": train_path,
                    "image_size": 32,
                    "patch_size": 16,
                    "max_seq_len": 32,
                    "min_shift": 2,
                    "global_batch_size": 16,
                    "tasks": "mlm,mpp,itm",
                    "mlm_max_selections_per_seq": 8,
                    "mpp_max_selections_per_seq": 4,
                    "min_text_wordpieces": 3,
                },
            },
            "trainer": {
                "train_steps": 2,
                "steps_per_loop": 1,
                "summary_interval": 1,
                "checkpoint_interval": 2,
                "validation_interval": 100,
            },
        }
    )
    model_dir = str(tmp_path / "model_pp")
    main([
        "--experiment=mmt/pretraining",
        "--mode=train",
        f"--model_dir={model_dir}",
        f"--params_override={override}",
    ])
    with open(os.path.join(model_dir, "train_summaries.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    for key in ("total_loss", "mlm_loss", "mpp_loss", "itm_loss"):
        assert key in rows[-1], rows[-1]
        assert np.isfinite(rows[-1][key])
