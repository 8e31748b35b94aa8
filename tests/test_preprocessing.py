"""Preprocessing builders + predict CLI end-to-end."""

import io
import json
import os

import numpy as np

from mmt_tpu.data.tfrecord import TFRecordReader, TFRecordWriter, build_example, parse_example
from tests.test_data_pipeline import VOCAB, make_vocab, png_bytes


def paired_flickr_records(path, n_images, rng):
    """Reference-input-format records: image/key, image/encoded, captions."""
    with TFRecordWriter(path) as w:
        for i in range(n_images):
            captions = [f"caption {j} for image {i}".encode() for j in range(5)]
            w.write(
                build_example(
                    {
                        "image/key": [f"im{i}".encode()],
                        "image/encoded": [png_bytes(rng)],
                        "caption/tokenized_text": captions,
                    }
                )
            )


class TestFlickr30kBuilder:
    def test_builds_indices_and_meta(self, tmp_path):
        from mmt_tpu.preprocessing.flickr30k import main

        rng = np.random.default_rng(0)
        src = str(tmp_path / "flickr30k.val.recordio")
        paired_flickr_records(src, 4, rng)
        out = str(tmp_path / "out")
        main([
            "--input_files=" + str(tmp_path / "flickr30k.{}.recordio"),
            f"--eval_data_dir={out}",
            "--topk_images=3",
            "--splits=val",
        ])
        with open(os.path.join(out, "input_meta_data")) as f:
            meta = json.load(f)
        assert meta["val_num_image_examples"] == 3  # topk subsample
        assert meta["val_num_text_examples"] == 20  # 4 images x 5 captions
        texts = [
            parse_example(p)
            for p in TFRecordReader(meta["val_text_input_path"])
        ]
        # Captions of the 4th image have gt -1 (image not in topk pool).
        gts = [t["gt_image_index"][0] for t in texts]
        assert gts[:15] == [0] * 5 + [1] * 5 + [2] * 5
        assert gts[15:] == [-1] * 5

    def test_wit_dedup(self, tmp_path):
        from mmt_tpu.preprocessing.wit import main

        rng = np.random.default_rng(1)
        src = str(tmp_path / "wit.val.recordio")
        with TFRecordWriter(src) as w:
            for doc, caption in [("a", "x"), ("a", "y"), ("b", "z"), ("a", "x")]:
                w.write(
                    build_example(
                        {
                            "canonical_doc_id": [doc.encode()],
                            "image_data": [png_bytes(rng)],
                            "caption_attribution_description": [caption.encode()],
                        }
                    )
                )
        out = str(tmp_path / "wout")
        main([
            "--input_files=" + str(tmp_path / "wit.{}.recordio"),
            f"--eval_data_dir={out}",
            "--splits=val",
        ])
        with open(os.path.join(out, "input_meta_data")) as f:
            meta = json.load(f)
        assert meta["val_num_image_examples"] == 2  # a, b deduped
        assert meta["val_num_text_examples"] == 3  # duplicate (a, x) dropped


class TestPredictCli:
    def test_predict_cli_end_to_end(self, tmp_path):
        """meta json + checkpoint + records -> results.csv/recall.json."""
        import jax

        from mmt_tpu.cli.predict import main as predict_main
        from mmt_tpu.configs import (
            ClsHeadConfig,
            ClassificationModelConfig,
            ClassificationTaskConfig,
            MmtRetrievalDataConfig,
            TrainerConfig,
        )
        from mmt_tpu.configs.encoder import EncoderConfig, MmtEncoderConfig
        from mmt_tpu.data.loaders import MmtRetrievalLoader
        from mmt_tpu.train.checkpoint import CheckpointManager
        from mmt_tpu.train.tasks import ClassificationTask
        from tests.test_data_pipeline import data_kwargs, write_records

        rng = np.random.default_rng(0)
        vocab = make_vocab(tmp_path)
        imgs = str(tmp_path / "img.tfrecord")
        txts = str(tmp_path / "txt.tfrecord")
        write_records(imgs, 2, rng, with_indices=True, image_only=True)
        write_records(txts, 4, rng, with_indices=True, text_only=True)

        meta = {
            "max_seq_length": 32,
            "test_image_input_path": imgs,
            "test_text_input_path": txts,
            "test_num_image_examples": 2,
            "test_num_text_examples": 4,
        }
        meta_path = str(tmp_path / "meta.json")
        with open(meta_path, "w") as f:
            json.dump(meta, f)

        # Save a checkpoint with the tiny geometry; override as yaml.
        import yaml as yamllib

        enc_override = yamllib.safe_dump(
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
                        "image_size": 32,
                        "patch_size": 16,
                        "max_seq_len": 32,
                    },
                }
            }
        )

        data_cfg = MmtRetrievalDataConfig(
            **data_kwargs(vocab, image_input_path=imgs, text_input_path=txts,
                          global_batch_size=8, is_training=False)
        )
        enc = MmtEncoderConfig(
            vocab_size=40, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=64,
            relative_pos_max_distance=3, relative_vocab_size=12,
            relative_att_num_core_layers=1, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, compute_dtype="float32",
        )
        task = ClassificationTask(
            ClassificationTaskConfig(
                model=ClassificationModelConfig(
                    encoder=EncoderConfig(mmt=enc),
                    cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
                ),
                train_data=data_cfg,
            ),
            TrainerConfig(),
        )
        first = next(iter(MmtRetrievalLoader(data_cfg).load()))
        params = task.init(jax.random.PRNGKey(0), first)
        ckpt_dir = str(tmp_path / "ckpt")
        CheckpointManager(ckpt_dir).save(1, jax.device_get(params))

        out_dir = str(tmp_path / "pred")
        predict_main([
            f"--input_meta_data_path={meta_path}",
            "--predict_split=test",
            f"--init_checkpoint={ckpt_dir}",
            f"--test_output_dir={out_dir}",
            "--predict_global_batch_size=8",
            f"--params_override={enc_override}",
        ])
        assert os.path.exists(os.path.join(out_dir, "results.csv"))
        with open(os.path.join(out_dir, "recall.json")) as f:
            recall = json.load(f)
        assert len(recall) == 8


class TestFashionGenCandidates:
    def test_candidate_pools(self, tmp_path):
        from mmt_tpu.preprocessing.fashion_gen import build_candidates

        info = tmp_path / "info.txt"
        lines = []
        for i in range(40):
            lines.append(
                "\x01".join(
                    [f"main{i}", f"img{i}", "cat", "x", "subcat", "y",
                     f"description of product {i}"]
                )
            )
        info.write_text("\n".join(lines) + "\n")

        csv_path = str(tmp_path / "i2t.csv")
        n = build_candidates(str(info), "i2t", csv_path,
                             num_queries=5, pool_size=11, seed=1)
        import pandas as pd

        df = pd.read_csv(csv_path)
        assert len(df) == n
        # 5 query images x 11 candidate texts each (minus rare gt dropout).
        assert df["image_index"].nunique() == 5
        per_query = df.groupby("image_index").size()
        assert set(per_query) <= {10, 11}
        # Each pool contains its ground truth (gt == the query image) at
        # most once; missing gt -> -1 entries allowed.
        hits = df[df["gt_image_index"] == df["image_index"]]
        assert hits.groupby("image_index").size().max() == 1
        # The recall computation consumes this CSV shape directly.
        from mmt_tpu.eval.recall import get_recall_at_k_from_dataframe

        df["output"] = (df["gt_image_index"] == df["image_index"]).astype(float)
        recall = get_recall_at_k_from_dataframe(df)
        assert recall["i2t @  1"] == "1.0000"  # oracle scores -> perfect recall
