"""RandAugment tests."""

import numpy as np

from mmt_tpu.data.rand_augment import RandAugment


def test_all_ops_run_and_preserve_shape():
    rng = np.random.default_rng(0)
    im = rng.random((32, 32, 3)).astype(np.float32)
    ra = RandAugment(num_layers=1)
    for name in RandAugment.OPS:
        out = ra._ops[name](im, 10.0, rng)
        assert out.shape == im.shape, name
        assert out.dtype == np.float32, name
        assert 0.0 <= out.min() and out.max() <= 1.0, name


def test_no_invert_no_cutout():
    # The reference removes these from the pool (data_utils.py:128-145).
    assert "Invert" not in RandAugment.OPS
    assert "Cutout" not in RandAugment.OPS
    assert len(RandAugment.OPS) == 14


def test_deterministic_given_seed():
    im = np.random.default_rng(1).random((32, 32, 3)).astype(np.float32)
    ra = RandAugment()
    out1 = ra(im, np.random.default_rng(7))
    out2 = ra(im, np.random.default_rng(7))
    np.testing.assert_array_equal(out1, out2)


def test_loader_applies_rand_aug(tmp_path):
    from mmt_tpu.configs.data import MmtPretrainDataConfig
    from mmt_tpu.data.loaders import MmtPretrainLoader
    from tests.test_data_pipeline import data_kwargs, make_vocab, write_records

    rng = np.random.default_rng(2)
    vocab = make_vocab(tmp_path)
    path = write_records(str(tmp_path / "t.tfrecord"), 20, rng)
    kwargs = data_kwargs(vocab, input_path=path, tasks="mlm", global_batch_size=8,
                         mlm_max_selections_per_seq=8, mpp_max_selections_per_seq=4)
    base = next(iter(MmtPretrainLoader(MmtPretrainDataConfig(**kwargs)).load()))
    aug = next(iter(MmtPretrainLoader(
        MmtPretrainDataConfig(**dict(kwargs, use_rand_aug=True))
    ).load()))
    # Same records, same seed: augmented patches differ from base for at
    # least some example (ops change pixels; identical would mean no-op).
    assert not np.allclose(base["patch_embeddings"], aug["patch_embeddings"])
