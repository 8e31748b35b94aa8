"""Smoke tests for the --e2e bench paths (tiny models, CPU): the
dataset builder, the host-stage timer, and both streaming disk->device
measurement loops must run end to end."""

import sys

import pytest

sys.path.insert(0, "scripts")


@pytest.fixture(scope="module")
def e2e_dataset(tmp_path_factory):
    import bench_suite

    root = str(tmp_path_factory.mktemp("e2e"))
    rp, vp = bench_suite._make_e2e_dataset(root, n_records=48)
    return root, rp, vp


def _tiny_pretrain_task(seq_len, micro):
    from mmt_tpu.configs import (
        ClsHeadConfig,
        MmtEncoderConfig,
        MmtPretrainDataConfig,
        PretrainModelConfig,
        PretrainingTaskConfig,
        TrainerConfig,
    )
    from mmt_tpu.configs.encoder import EncoderConfig
    from mmt_tpu.train.tasks import PretrainingTask

    enc = MmtEncoderConfig(
        vocab_size=26000, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        relative_vocab_size=49, relative_att_num_core_layers=1,
        compute_dtype="float32", attention_impl="xla",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg = PretrainingTaskConfig(
        model=PretrainModelConfig(
            encoder=EncoderConfig(mmt=enc),
            cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
        ),
        train_data=MmtPretrainDataConfig(max_seq_len=seq_len),
    )
    trainer = TrainerConfig(
        train_steps=10, steps_per_loop=5, summary_interval=10**9,
        checkpoint_interval=10**9, validation_interval=10**9,
        micro_batch_size=micro,
    )
    return PretrainingTask(cfg, trainer)


def _tiny_cls_task(seq_len):
    from mmt_tpu.configs import (
        ClassificationModelConfig,
        ClassificationTaskConfig,
        ClsHeadConfig,
        MmtClassificationDataConfig,
        MmtEncoderConfig,
        TrainerConfig,
    )
    from mmt_tpu.configs.encoder import EncoderConfig
    from mmt_tpu.train.tasks import ClassificationTask

    enc = MmtEncoderConfig(
        vocab_size=26000, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        relative_vocab_size=49, relative_att_num_core_layers=1,
        compute_dtype="float32", attention_impl="xla",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg = ClassificationTaskConfig(
        model=ClassificationModelConfig(
            encoder=EncoderConfig(mmt=enc), num_classes=2,
            cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
        ),
        train_data=MmtClassificationDataConfig(max_seq_len=seq_len),
    )
    return ClassificationTask(cfg, TrainerConfig())


def test_host_stages_and_pipeline(e2e_dataset):
    import bench_suite

    root, rp, vp = e2e_dataset
    stages = bench_suite._measure_host_stages(rp, vp, n=8)
    assert set(stages) == {
        "parse_ms", "jpeg_decode_ms", "resize_patches_ms",
        "tokenize_trim_ms", "assemble_total_ms", "masking_ms",
    }
    assert all(v >= 0 for v in stages.values())
    eps = bench_suite._measure_host_pipeline(rp, vp, batch=16, n_batches=2)
    assert eps > 0


def test_e2e_pretrain_stream(e2e_dataset, monkeypatch):
    import bench_suite

    root, rp, vp = e2e_dataset
    monkeypatch.setattr(bench_suite, "_pretrain_task", _tiny_pretrain_task)
    eps = bench_suite._measure_e2e_pretrain(
        rp, vp, batch=16, seq_len=256, micro=8, chunk=2, n_chunks=2)
    assert eps > 0


def test_e2e_pretrain_stream_raw(e2e_dataset, monkeypatch):
    """ship_raw_images variant of the streaming e2e pretrain bench."""
    import bench_suite

    root, rp, vp = e2e_dataset
    monkeypatch.setattr(bench_suite, "_pretrain_task", _tiny_pretrain_task)
    eps = bench_suite._measure_e2e_pretrain(
        rp, vp, batch=16, seq_len=256, micro=8, chunk=2, n_chunks=2,
        ship_raw=True)
    assert eps > 0
    eps_host = bench_suite._measure_host_pipeline(
        rp, vp, batch=16, n_batches=2, ship_raw=True)
    assert eps_host > 0


def test_e2e_predict_stream(e2e_dataset, monkeypatch):
    import bench_suite

    root, rp, vp = e2e_dataset
    monkeypatch.setattr(bench_suite, "_classification_task", _tiny_cls_task)
    eps = bench_suite._measure_e2e_predict(
        root, vp, batch=8, seq_len=256, chunk=2)
    assert eps > 0
