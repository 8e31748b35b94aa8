"""Serving-artifact export (``mmt_tpu/eval/export.py``).

A TPU-native serving surface with no reference counterpart (the
reference rebuilds the Keras model + checkpoint per process,
``src/predict.py:105-146``): the scoring computation serialized as
shape-polymorphic StableHLO, loadable and callable without the model
code.
"""

import json
import os

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from mmt_tpu.eval.export import export_scoring, load_scoring, scoring_inputs
from tests.test_train import classification_batch, make_classification_task


@pytest.fixture(scope="module")
def exported():
    task = make_classification_task()
    batch = classification_batch(B=4)
    params = task.init(jax.random.PRNGKey(0), batch)
    blob = export_scoring(task, params, batch)
    return task, params, blob


class TestExportScoring:
    def test_round_trip_matches_inference_step(self, exported):
        task, params, blob = exported
        assert isinstance(blob, bytes) and len(blob) > 1000
        art = load_scoring(blob)
        step = task.make_inference_step()
        for B in (4, 8):  # symbolic batch: one artifact, many batch sizes
            batch = classification_batch(B=B)
            got = np.asarray(art.call(params, scoring_inputs(batch)))
            want = np.asarray(step(params, batch))
            assert got.shape == (B,)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_params_are_arguments_not_constants(self, exported):
        task, params, blob = exported
        art = load_scoring(blob)
        step = task.make_inference_step()
        # A perturbed checkpoint flows through the SAME artifact.
        params2 = jax.tree.map(lambda x: x + 0.05, params)
        batch = classification_batch(B=4)
        got = np.asarray(art.call(params2, scoring_inputs(batch)))
        want = np.asarray(step(params2, batch))
        assert not np.allclose(got, np.asarray(step(params, batch)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


    def test_static_batch_export(self, exported):
        """symbolic_batch=False (the Mosaic-kernel path): the artifact is
        fixed to the example batch size."""
        task, params, _ = exported
        batch = classification_batch(B=4)
        blob = export_scoring(task, params, batch, symbolic_batch=False)
        art = load_scoring(blob)
        got = np.asarray(art.call(params, scoring_inputs(batch)))
        want = np.asarray(task.make_inference_step()(params, batch))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
        with pytest.raises(Exception):  # wrong batch size must be rejected
            art.call(params, scoring_inputs(classification_batch(B=8)))


def test_predict_cli_export_flag(tmp_path):
    """--export_serving_artifact writes a loadable artifact and skips
    scoring (no results.csv)."""
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
    from tests.test_data_pipeline import data_kwargs, make_vocab, write_records

    import yaml as yamllib

    rng = np.random.default_rng(0)
    vocab = make_vocab(tmp_path)
    imgs = str(tmp_path / "img.tfrecord")
    txts = str(tmp_path / "txt.tfrecord")
    write_records(imgs, 2, rng, with_indices=True, image_only=True)
    write_records(txts, 4, rng, with_indices=True, text_only=True)

    meta_path = str(tmp_path / "meta.json")
    with open(meta_path, "w") as f:
        json.dump({
            "max_seq_length": 32,
            "test_image_input_path": imgs,
            "test_text_input_path": txts,
            "test_num_image_examples": 2,
            "test_num_text_examples": 4,
        }, f)

    enc_kw = dict(
        vocab_size=40, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        relative_pos_max_distance=3, relative_vocab_size=12,
        relative_att_num_core_layers=1, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, compute_dtype="float32",
    )
    enc_override = yamllib.safe_dump({
        "task": {
            "model": {
                "encoder": {"mmt": dict(enc_kw)},
                "cls_heads": [
                    {"inner_dim": 32, "num_classes": 2, "name": "itm"}
                ],
            },
            "train_data": {
                "vocab_filename": vocab, "image_size": 32,
                "patch_size": 16, "max_seq_len": 32,
            },
        }
    })

    data_cfg = MmtRetrievalDataConfig(
        **data_kwargs(vocab, image_input_path=imgs, text_input_path=txts,
                      global_batch_size=8, is_training=False)
    )
    task = ClassificationTask(
        ClassificationTaskConfig(
            model=ClassificationModelConfig(
                encoder=EncoderConfig(mmt=MmtEncoderConfig(**enc_kw)),
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
    artifact = str(tmp_path / "scoring.jaxexport")
    predict_main([
        f"--input_meta_data_path={meta_path}",
        "--predict_split=test",
        f"--init_checkpoint={ckpt_dir}",
        f"--test_output_dir={out_dir}",
        "--predict_global_batch_size=8",
        f"--params_override={enc_override}",
        f"--export_serving_artifact={artifact}",
    ])
    assert os.path.exists(artifact)
    assert not os.path.exists(os.path.join(out_dir, "results.csv"))

    art = load_scoring(open(artifact, "rb").read())
    scores = np.asarray(art.call(params, scoring_inputs(first)))
    step = task.make_inference_step()
    np.testing.assert_allclose(scores, np.asarray(step(params, first)),
                               rtol=1e-6, atol=1e-7)


class TestScoringBundle:
    """Bucketed static-batch bundle (the Mosaic-kernel serving story)."""

    def test_bundle_pads_splits_and_matches_direct(self, exported):
        from mmt_tpu.eval.export import (
            export_scoring_bundle,
            load_scoring_bundle,
        )

        task, params, _ = exported
        batch = classification_batch(B=4)
        blob = export_scoring_bundle(task, params, batch, batch_sizes=(1, 4))
        scorer = load_scoring_bundle(blob)
        assert scorer.batch_sizes == [1, 4]
        step = task.make_inference_step()
        # 1 = exact small bucket; 3 = padded to 4; 4 = exact; 6 = split
        # into a 4-chunk + a padded 4-chunk.
        for B in (1, 3, 4, 6):
            batch_b = classification_batch(B=B)
            got = scorer.call(params, scoring_inputs(batch_b))
            want = np.asarray(step(params, batch_b))
            assert got.shape == (B,)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_bundle_rejects_foreign_zip(self):
        import io
        import zipfile

        from mmt_tpu.eval.export import load_scoring_bundle

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("manifest.json", json.dumps({"format": "nope"}))
        with pytest.raises(ValueError):
            load_scoring_bundle(buf.getvalue())
