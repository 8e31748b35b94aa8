"""End-to-end smoke tests: CLI training on dummy + real data, retrieval
prediction producing results.csv / recall.json, checkpoint restore chain."""

import io
import json
import os

import numpy as np
import pytest

from tests.test_data_pipeline import (
    VOCAB,
    data_kwargs,
    make_vocab,
    write_records,
)

TINY_ENCODER_OVERRIDE = (
    "task.model.encoder.mmt.vocab_size=64,"
    "task.model.encoder.mmt.hidden_size=32,"
    "task.model.encoder.mmt.num_hidden_layers=2,"
    "task.model.encoder.mmt.num_attention_heads=2,"
    "task.model.encoder.mmt.intermediate_size=64,"
    "task.model.encoder.mmt.relative_pos_max_distance=3,"
    "task.model.encoder.mmt.relative_vocab_size=12,"
    "task.model.encoder.mmt.relative_att_num_core_layers=1,"
    "task.model.encoder.mmt.compute_dtype=float32,"
    "task.model.encoder.mmt.hidden_dropout_prob=0.0,"
    "task.model.encoder.mmt.attention_probs_dropout_prob=0.0"
)


class TestTrainCliDummy:
    def test_pretraining_dummy_path(self, tmp_path):
        from mmt_tpu.cli.train import main

        model_dir = str(tmp_path / "model")
        override = (
            TINY_ENCODER_OVERRIDE
            + ",task.train_data.input_path=dummy"
            + ",task.train_data.global_batch_size=8"
            + ",task.train_data.max_seq_len=16"
            + ",task.train_data.image_size=32"
            + ",task.train_data.patch_size=16"
            + ",task.train_data.mlm_max_selections_per_seq=4"
            + ",task.train_data.mpp_max_selections_per_seq=2"
            + ",trainer.train_steps=3,trainer.steps_per_loop=1"
            + ",trainer.checkpoint_interval=3,trainer.summary_interval=1"
            + ",trainer.micro_batch_size=4"
        )
        main([
            "--experiment=mmt/pretraining",
            "--mode=train",
            f"--model_dir={model_dir}",
            f"--params_override={override}",
        ])
        assert os.path.exists(os.path.join(model_dir, "params.yaml"))
        assert os.path.exists(os.path.join(model_dir, "train_summaries.jsonl"))
        # A checkpoint was written at step 3.
        from mmt_tpu.train.checkpoint import CheckpointManager

        assert CheckpointManager(model_dir).latest_step() == 3


class TestRetrievalEndToEnd:
    def test_predict_writes_results_and_recall(self, tmp_path):
        """Full slice: records -> loader -> model -> results.csv + recall.json."""
        import jax

        from mmt_tpu.configs import (
            ClsHeadConfig,
            ClassificationModelConfig,
            ClassificationTaskConfig,
            MmtRetrievalDataConfig,
            TrainerConfig,
        )
        from mmt_tpu.configs.encoder import EncoderConfig, MmtEncoderConfig
        from mmt_tpu.data.loaders import MmtRetrievalLoader
        from mmt_tpu.eval.predict import predict, write_results
        from mmt_tpu.train.tasks import ClassificationTask

        rng = np.random.default_rng(0)
        vocab = make_vocab(tmp_path)
        imgs = write_records(
            str(tmp_path / "img.tfrecord"), 3, rng, with_indices=True, image_only=True
        )
        txts = write_records(
            str(tmp_path / "txt.tfrecord"), 6, rng, with_indices=True, text_only=True
        )
        data_cfg = MmtRetrievalDataConfig(
            **data_kwargs(vocab, image_input_path=imgs, text_input_path=txts,
                          num_image_examples=3, num_text_examples=6,
                          global_batch_size=8, is_training=False)
        )
        enc = MmtEncoderConfig(
            vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=64,
            relative_pos_max_distance=3, relative_vocab_size=12,
            relative_att_num_core_layers=1, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, compute_dtype="float32",
        )
        task_cfg = ClassificationTaskConfig(
            model=ClassificationModelConfig(
                encoder=EncoderConfig(mmt=enc),
                num_classes=2,
                cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
            ),
            train_data=data_cfg,
        )
        task = ClassificationTask(task_cfg, TrainerConfig())
        loader = MmtRetrievalLoader(data_cfg)
        first = next(iter(loader.load()))
        params = task.init(jax.random.PRNGKey(0), first)

        step = task.make_inference_step()
        out_dir = str(tmp_path / "out")
        recall = write_results(predict(step, params, loader.load()), out_dir)

        assert os.path.exists(os.path.join(out_dir, "results.csv"))
        with open(os.path.join(out_dir, "recall.json")) as f:
            saved = json.load(f)
        assert saved == recall
        assert set(recall) == {
            f"{d} @ {k:>2}" for d in ("i2t", "t2i") for k in (1, 3, 5, 10)
        }
        # results.csv: 18 rows (3 x 6), scores in [0, 1], 8-decimal format.
        import pandas as pd

        df = pd.read_csv(os.path.join(out_dir, "results.csv"))
        assert len(df) == 18
        assert df["output"].between(0, 1).all()
        assert set(df.columns) == {
            "image_index", "text_index", "gt_image_index", "output"
        }
        # Recall values are parseable probabilities.
        for v in recall.values():
            assert 0.0 <= float(v) <= 1.0

        # Multi-chip scoring (GSPMD over the 'data' axis; reference
        # distributed predict, src/tasks/classification.py:302-322)
        # produces byte-identical outputs on the 8-device mesh.
        from mmt_tpu.parallel import create_mesh

        mesh = create_mesh(num_data=jax.device_count(), num_model=1)
        sharded_step = task.make_inference_step(mesh=mesh)
        out_dir2 = str(tmp_path / "out_sharded")
        recall2 = write_results(
            predict(sharded_step, params, loader.load()), out_dir2
        )
        assert recall2 == recall
        assert (
            open(os.path.join(out_dir2, "results.csv"), "rb").read()
            == open(os.path.join(out_dir, "results.csv"), "rb").read()
        )


class TestCheckpointChain:
    def test_pretrain_to_finetune_restore(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from mmt_tpu.configs import (
            ClsHeadConfig,
            ClassificationModelConfig,
            PretrainModelConfig,
        )
        from mmt_tpu.configs.encoder import EncoderConfig, MmtEncoderConfig
        from mmt_tpu.models import MmtClassificationModel, MmtPretrainingModel
        from mmt_tpu.train.checkpoint import (
            CheckpointManager,
            count_restored,
            restore_encoder_and_heads,
        )

        enc = MmtEncoderConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=64,
            relative_pos_max_distance=3, relative_vocab_size=12,
            relative_att_num_core_layers=1, compute_dtype="float32",
        )
        heads = [ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")]
        pre = MmtPretrainingModel(
            PretrainModelConfig(encoder=EncoderConfig(mmt=enc), cls_heads=heads),
            num_patch_per_row=2,
        )
        inputs = dict(
            word_ids=jnp.zeros((1, 8), jnp.int32),
            patch_embeddings=jnp.zeros((1, 4, 12), jnp.float32),
            lengths=jnp.full((1,), 8, jnp.int32),
            mlm_positions=jnp.zeros((1, 2), jnp.int32),
            mpp_positions=jnp.zeros((1, 2), jnp.int32),
        )
        pre_params = pre.init(jax.random.PRNGKey(0), **inputs)

        # Save + reload via orbax.
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(1, jax.device_get(pre_params))
        restored = mgr.restore(template={"params": jax.device_get(pre_params)})

        cls = MmtClassificationModel(
            ClassificationModelConfig(encoder=EncoderConfig(mmt=enc), cls_heads=heads),
            num_patch_per_row=2,
        )
        cls_inputs = {k: v for k, v in inputs.items() if "positions" not in k}
        cls_params = cls.init(jax.random.PRNGKey(1), **cls_inputs)

        n = count_restored(cls_params, restored["params"])
        assert n > 10  # encoder + itm head params mapped
        merged = restore_encoder_and_heads(cls_params, restored["params"])
        import flax

        flat_src = flax.traverse_util.flatten_dict(pre_params["params"])
        flat_dst = flax.traverse_util.flatten_dict(merged["params"])
        key = ("encoder", "word_embeddings", "embedding_table")
        np.testing.assert_array_equal(flat_dst[key], flat_src[key])
        key = ("cls_head_itm", "out_proj", "kernel")
        np.testing.assert_array_equal(flat_dst[key], flat_src[key])
