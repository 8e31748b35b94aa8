"""End-to-end data pipeline tests over synthetic TFRecords."""

import io
import json
import os

import numpy as np
import pytest

from mmt_tpu.configs.data import (
    MmtClassificationDataConfig,
    MmtPretrainDataConfig,
    MmtRetrievalDataConfig,
)
from mmt_tpu.data.tfrecord import (
    TFRecordReader,
    TFRecordWriter,
    build_example,
    parse_example,
)
from mmt_tpu.data.loaders import (
    MmtClassificationLoader,
    MmtPretrainLoader,
    MmtRetrievalLoader,
)

WORDS = ["red", "blue", "shirt", "dress", "cotton", "wool", "style", "fashion"]
VOCAB = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[ATT]", "[REF]", "[PATCH]"]
    + [f"[unused{i}]" for i in range(99, 120)]
    + WORDS
)


def make_vocab(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def png_bytes(rng, size=32):
    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    im = Image.fromarray(arr)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def write_records(path, n, rng, with_indices=False, image_only=False, text_only=False):
    with TFRecordWriter(path) as w:
        for i in range(n):
            feats = {}
            if not text_only:
                feats["image_data"] = [png_bytes(rng)]
                feats["image_key"] = [f"img{i}".encode()]
            if not image_only:
                caption = " ".join(rng.choice(WORDS, size=8))
                feats["caption_attribution_description"] = [caption.encode()]
                feats["caption_reference_description"] = [
                    " ".join(rng.choice(WORDS, size=4)).encode()
                ]
            if with_indices:
                if image_only:
                    feats["image_index"] = [i]
                elif text_only:
                    feats["text_index"] = [i]
                    feats["gt_image_index"] = [i // 2]
                else:
                    feats["image_index"] = [i]
                    feats["text_index"] = [i]
                    feats["gt_image_index"] = [i]
            w.write(build_example(feats))
    return path


def data_kwargs(vocab, **kw):
    base = dict(
        vocab_filename=vocab,
        image_size=32,
        patch_size=16,  # 4 patches
        max_seq_len=32,
        seed=7,
    )
    base.update(kw)
    return base


class TestTFRecordRoundtrip:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.tfrecord")
        with TFRecordWriter(p) as w:
            w.write(build_example({"a": [b"xy"], "b": [1.5], "c": [7, -2]}))
        recs = list(TFRecordReader(p, check_crc=True))
        assert len(recs) == 1
        got = parse_example(recs[0])
        assert got["a"] == [b"xy"]
        np.testing.assert_allclose(got["b"], [1.5])
        assert got["c"] == [7, -2]


class TestPretrainLoader:
    def test_batch_contract(self, tmp_path):
        rng = np.random.default_rng(0)
        vocab = make_vocab(tmp_path)
        path = write_records(str(tmp_path / "train.tfrecord"), 24, rng)
        cfg = MmtPretrainDataConfig(
            **data_kwargs(vocab, input_path=path, tasks="mlm,mpp,itm",
                          global_batch_size=16, min_shift=2, is_training=False,
                          mlm_max_selections_per_seq=8,
                          mpp_max_selections_per_seq=4)
        )
        loader = MmtPretrainLoader(cfg)
        batch = next(iter(loader.load()))

        B, S = 16, 32
        assert batch["word_ids"].shape == (B, S)
        assert batch["patch_embeddings"].shape == (B, 4, 768)
        assert batch["mlm_positions"].shape == (B, 8)
        assert batch["mpp_positions"].shape == (B, 4)
        assert batch["itm_label_ids"].shape == (B,)
        # First half positives, second half negatives (ratio 1).
        assert batch["itm_label_ids"][:8].sum() == 8
        assert batch["itm_label_ids"][8:].sum() == 0
        # Sequence layout: [CLS] [PATCH] p1..p4 then text special token.
        cls, patch = VOCAB.index("[CLS]"), VOCAB.index("[PATCH]")
        att = VOCAB.index("[ATT]")
        assert batch["word_ids"][0, 0] == cls
        assert batch["word_ids"][0, 1] == patch
        assert batch["word_ids"][0, 6] == att
        # segment ids: image part 1, first text slot quirk 0, then 2.
        assert batch["segment_ids"][0, 0] == 1
        assert batch["segment_ids"][0, 6] == 0
        assert batch["segment_ids"][0, 7] == 2
        # lengths = img_wp + txt_wp <= S.
        assert np.all(batch["lengths"] <= S)
        assert np.all(batch["lengths"] >= 6 + 6)

    def test_mpp_positions_point_at_patches(self, tmp_path):
        rng = np.random.default_rng(1)
        vocab = make_vocab(tmp_path)
        path = write_records(str(tmp_path / "t.tfrecord"), 12, rng)
        cfg = MmtPretrainDataConfig(
            **data_kwargs(vocab, input_path=path, tasks="mlm,mpp",
                          global_batch_size=4, mpp_fraction_to_mask=1.0,
                          mlm_max_selections_per_seq=8,
                          mpp_max_selections_per_seq=4)
        )
        batch = next(iter(MmtPretrainLoader(cfg).load()))
        # All 4 patches masked; positions 2..5; labels in [0, 512).
        np.testing.assert_array_equal(np.sort(batch["mpp_positions"][0]), [2, 3, 4, 5])
        assert np.all(batch["mpp_label_ids"] >= 0)
        assert np.all(batch["mpp_label_ids"] < 512)
        # Masked patches' embeddings zeroed where token == [MASK].
        mask_id = VOCAB.index("[MASK]")
        masked = batch["word_ids"][0, 2:6] == mask_id
        assert np.all(batch["patch_embeddings"][0][masked] == 0)


class TestShipRawImagesPretrain:
    def _cfgs(self, tmp_path, **kw):
        rng = np.random.default_rng(9)
        vocab = make_vocab(tmp_path)
        path = write_records(str(tmp_path / "raw.tfrecord"), 24, rng)
        base = data_kwargs(
            vocab, input_path=path, tasks="mlm,mpp,itm", global_batch_size=12,
            min_shift=2, mlm_max_selections_per_seq=8,
            mpp_max_selections_per_seq=4, **kw,
        )
        return (
            MmtPretrainDataConfig(**base),
            MmtPretrainDataConfig(**base, ship_raw_images=True),
        )

    def test_raw_batch_matches_host_batch(self, tmp_path):
        """ship_raw_images pretraining: identical masking/labels, and the
        device-side extract+normalize+zero reproduces the host patch
        tensor bit-for-bit (same /255 rounding path)."""
        from mmt_tpu.features.patches import extract_patches, normalize_image

        host_cfg, raw_cfg = self._cfgs(tmp_path, is_training=False)
        b_host = next(iter(MmtPretrainLoader(host_cfg).load()))
        b_raw = next(iter(MmtPretrainLoader(raw_cfg).load()))

        for key in ("word_ids", "segment_ids", "lengths", "mlm_positions",
                    "mlm_label_ids", "mlm_label_weights", "mpp_positions",
                    "mpp_label_ids", "mpp_label_weights", "itm_label_ids"):
            np.testing.assert_array_equal(b_raw[key], b_host[key], err_msg=key)
        assert "patch_embeddings" not in b_raw
        assert b_raw["images"].dtype == np.uint8
        assert b_raw["patch_mask"].shape == (12, 4)

        im = np.true_divide(b_raw["images"], 255, dtype=np.float32)
        pe = extract_patches(normalize_image(im), host_cfg.patch_size)
        pe = pe * (1.0 - b_raw["patch_mask"][..., None])
        np.testing.assert_allclose(
            pe, b_host["patch_embeddings"], atol=1e-6, rtol=1e-6
        )

    def test_raw_mode_model_loss_matches(self, tmp_path):
        """The pretraining task consumes the raw batch (images +
        patch_mask through the XLA program) with identical loss."""
        from mmt_tpu.configs import (
            ClsHeadConfig,
            MmtEncoderConfig,
            PretrainModelConfig,
            PretrainingTaskConfig,
            TrainerConfig,
        )
        from mmt_tpu.configs.encoder import EncoderConfig
        from mmt_tpu.train.tasks import PretrainingTask
        import jax

        host_cfg, raw_cfg = self._cfgs(tmp_path, is_training=False)
        b_host = next(iter(MmtPretrainLoader(host_cfg).load()))
        b_raw = next(iter(MmtPretrainLoader(raw_cfg).load()))

        enc = MmtEncoderConfig(
            vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=64,
            relative_pos_max_distance=3, relative_vocab_size=12,
            relative_att_num_core_layers=1, compute_dtype="float32",
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        task = PretrainingTask(
            PretrainingTaskConfig(
                model=PretrainModelConfig(
                    encoder=EncoderConfig(mmt=enc),
                    cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2,
                                             name="itm")],
                ),
                train_data=host_cfg,
            ),
            TrainerConfig(),
        )
        params = task.init(jax.random.PRNGKey(0), b_host)
        loss_h, _ = task.compute_loss(params, b_host, None, True)
        loss_r, _ = task.compute_loss(params, b_raw, None, True)
        np.testing.assert_allclose(
            float(loss_r), float(loss_h), rtol=1e-6, atol=1e-6
        )


class TestShipRawImagesClassification:
    def test_raw_batch_matches_host_batch(self, tmp_path):
        """Classification loader raw mode: same batch through ITM mining
        (random flips included), device extraction == host patches."""
        from mmt_tpu.configs import MmtClassificationDataConfig
        from mmt_tpu.data.loaders import MmtClassificationLoader
        from mmt_tpu.features.patches import extract_patches, normalize_image

        rng = np.random.default_rng(11)
        vocab = make_vocab(tmp_path)
        path = write_records(str(tmp_path / "cls.tfrecord"), 24, rng)
        base = data_kwargs(
            vocab, input_path=path, global_batch_size=12, min_shift=2,
            negative_positive_ratio=1, is_training=True,
        )
        b_host = next(iter(MmtClassificationLoader(
            MmtClassificationDataConfig(**base)).load()))
        b_raw = next(iter(MmtClassificationLoader(
            MmtClassificationDataConfig(**base, ship_raw_images=True)).load()))

        for key in ("word_ids", "segment_ids", "lengths", "label_ids",
                    "label_weights", "pos_weights"):
            np.testing.assert_array_equal(b_raw[key], b_host[key], err_msg=key)
        im = np.true_divide(b_raw["images"], 255, dtype=np.float32)
        pe = extract_patches(normalize_image(im), 16)
        np.testing.assert_allclose(
            pe, b_host["patch_embeddings"], atol=1e-6, rtol=1e-6
        )


class TestItmPostMatchShuffle:
    def test_positives_and_negatives_mix_within_micro_batches(self, tmp_path):
        """Training ITM batches run through a post-match shuffle buffer
        (src/data/pretrain_dataloader.py:213-215), so every micro-batch
        slice under gradient accumulation mixes labels instead of the
        matched layout's positives-first halves."""
        rng = np.random.default_rng(11)
        vocab = make_vocab(tmp_path)
        path = write_records(str(tmp_path / "mix.tfrecord"), 24, rng)
        cfg = MmtPretrainDataConfig(
            **data_kwargs(vocab, input_path=path, tasks="mlm,mpp,itm",
                          global_batch_size=16, min_shift=2,
                          shuffle_buffer_size=64,
                          mlm_max_selections_per_seq=8,
                          mpp_max_selections_per_seq=4)
        )
        it = iter(MmtPretrainLoader(cfg).load())
        micro = 4  # grad-accum micro-batch size
        mixed = saw_pos = saw_neg = 0
        for _ in range(4):
            labels = next(it)["itm_label_ids"]
            assert labels.shape == (16,)
            saw_pos += int(labels.sum())
            saw_neg += int((1 - labels).sum())
            for j in range(0, 16, micro):
                chunk = labels[j:j + micro]
                if 0 < chunk.sum() < micro:
                    mixed += 1
        assert saw_pos and saw_neg
        # With a 64-example buffer, the vast majority of 4-element
        # micro-batches must contain both classes (deterministic seed).
        assert mixed >= 12, mixed


class TestClassificationLoader:
    def test_labels_and_ratio(self, tmp_path):
        rng = np.random.default_rng(2)
        vocab = make_vocab(tmp_path)
        path = write_records(str(tmp_path / "c.tfrecord"), 30, rng)
        cfg = MmtClassificationDataConfig(
            **data_kwargs(vocab, input_path=path, global_batch_size=24,
                          negative_positive_ratio=2, min_shift=2, pos_weight=3.0,
                          is_training=False)
        )
        batch = next(iter(MmtClassificationLoader(cfg).load()))
        assert batch["label_ids"].shape == (24,)
        assert batch["label_ids"][:8].sum() == 8
        assert batch["label_ids"][8:].sum() == 0
        np.testing.assert_array_equal(
            batch["pos_weights"], np.where(batch["label_ids"] > 0, 3.0, 1.0)
        )


class TestRetrievalLoader:
    def test_cross_product(self, tmp_path):
        rng = np.random.default_rng(3)
        vocab = make_vocab(tmp_path)
        imgs = write_records(
            str(tmp_path / "img.tfrecord"), 3, rng, with_indices=True, image_only=True
        )
        txts = write_records(
            str(tmp_path / "txt.tfrecord"), 4, rng, with_indices=True, text_only=True
        )
        cfg = MmtRetrievalDataConfig(
            **data_kwargs(vocab, image_input_path=imgs, text_input_path=txts,
                          num_image_examples=3, num_text_examples=4,
                          global_batch_size=8, is_training=False)
        )
        batches = list(MmtRetrievalLoader(cfg).load())
        # 3 x 4 = 12 pairs in batches of 8 -> 2 batches, second padded.
        assert len(batches) == 2
        assert batches[0]["valid"].sum() == 8
        assert batches[1]["valid"].sum() == 4
        # Every (image, text) combination appears exactly once.
        pairs = set()
        for b in batches:
            for i in range(8):
                if b["valid"][i]:
                    pairs.add((int(b["image_index"][i]), int(b["text_index"][i])))
        assert pairs == {(i, t) for i in range(3) for t in range(4)}
        # Label = image_index == gt_image_index (gt = text_index // 2).
        for b in batches:
            for i in range(8):
                if b["valid"][i]:
                    expect = int(b["image_index"][i] == b["gt_image_index"][i])
                    assert b["label_ids"][i] == expect

    def test_paired_records(self, tmp_path):
        rng = np.random.default_rng(4)
        vocab = make_vocab(tmp_path)
        path = write_records(
            str(tmp_path / "p.tfrecord"), 5, rng, with_indices=True
        )
        cfg = MmtRetrievalDataConfig(
            **data_kwargs(vocab, input_path=path, global_batch_size=4,
                          is_training=False)
        )
        batches = list(MmtRetrievalLoader(cfg).load())
        assert len(batches) == 2
        assert batches[1]["valid"].sum() == 1
        assert np.all(batches[0]["label_ids"] == 1)  # paired: img==gt



    def test_cross_product_streams_beyond_text_cache(self, tmp_path):
        """With max_cached_text_examples below the pool size, the tail is
        re-streamed from disk and the output is identical."""
        rng = np.random.default_rng(3)
        vocab = make_vocab(tmp_path)
        imgs = write_records(
            str(tmp_path / "i2.tfrecord"), 2, rng, with_indices=True, image_only=True
        )
        txts = write_records(
            str(tmp_path / "t2.tfrecord"), 5, rng, with_indices=True, text_only=True
        )
        kw = data_kwargs(vocab, image_input_path=imgs, text_input_path=txts,
                         num_image_examples=2, num_text_examples=5,
                         global_batch_size=4, is_training=False)
        full = list(MmtRetrievalLoader(
            MmtRetrievalDataConfig(**kw, max_cached_text_examples=100)).load())
        capped = list(MmtRetrievalLoader(
            MmtRetrievalDataConfig(**kw, max_cached_text_examples=2)).load())
        assert len(full) == len(capped)
        for a, b in zip(full, capped):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)


class TestDeterminism:
    def test_same_seed_same_batches(self, tmp_path):
        rng = np.random.default_rng(5)
        vocab = make_vocab(tmp_path)
        path = write_records(str(tmp_path / "d.tfrecord"), 20, rng)
        cfg = MmtPretrainDataConfig(
            **data_kwargs(vocab, input_path=path, tasks="mlm,mpp",
                          global_batch_size=8, mlm_max_selections_per_seq=8,
                          mpp_max_selections_per_seq=4)
        )
        b1 = next(iter(MmtPretrainLoader(cfg).load()))
        b2 = next(iter(MmtPretrainLoader(cfg).load()))
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)

    def test_different_shards_different_data(self, tmp_path):
        rng = np.random.default_rng(6)
        vocab = make_vocab(tmp_path)
        paths = [
            write_records(str(tmp_path / f"s{i}.tfrecord"), 10, rng)
            for i in range(2)
        ]
        cfg = MmtPretrainDataConfig(
            **data_kwargs(vocab, input_path=",".join(paths), tasks="mlm",
                          global_batch_size=4, mlm_max_selections_per_seq=8,
                          mpp_max_selections_per_seq=4)
        )
        loader = MmtPretrainLoader(cfg)
        b0 = next(iter(loader.load(shard_index=0, num_shards=2)))
        b1 = next(iter(loader.load(shard_index=1, num_shards=2)))
        assert not np.array_equal(b0["word_ids"], b1["word_ids"])

    @pytest.mark.parametrize("n_files,num_shards", [(2, 4), (8, 4)])
    def test_shards_partition_records(self, tmp_path, n_files, num_shards):
        # Both sharding branches must partition the record set exactly:
        # record-level striding (files < shards) and file slicing
        # (files >= shards).  Regression: a shard-dependent file-order
        # rng duplicated some records across shards and dropped others.
        rng = np.random.default_rng(11)
        vocab = make_vocab(tmp_path)
        paths = [
            write_records(str(tmp_path / f"p{n_files}_{i}.tfrecord"), 6, rng)
            for i in range(n_files)
        ]
        all_recs = sorted(
            bytes(r) for p in paths for r in TFRecordReader(p)
        )
        cfg = MmtPretrainDataConfig(
            **data_kwargs(vocab, input_path=",".join(paths), tasks="mlm",
                          is_training=False, global_batch_size=4,
                          mlm_max_selections_per_seq=8,
                          mpp_max_selections_per_seq=4)
        )
        loader = MmtPretrainLoader(cfg)
        per_shard = [
            [bytes(r) for r in loader._record_iter(
                cfg.input_path, s, num_shards, cfg.seed, repeat=False)]
            for s in range(num_shards)
        ]
        union = sorted(r for recs in per_shard for r in recs)
        assert union == all_recs  # disjoint AND complete


class TestMultiprocessLoader:
    def test_parallel_matches_shard_union(self, tmp_path):
        from mmt_tpu.data.prefetch import LoaderShard, multiprocess_batches

        rng = np.random.default_rng(9)
        vocab = make_vocab(tmp_path)
        paths = [
            write_records(str(tmp_path / f"w{i}.tfrecord"), 12, rng)
            for i in range(2)
        ]
        cfg = MmtPretrainDataConfig(
            **data_kwargs(vocab, input_path=",".join(paths), tasks="mlm",
                          is_training=False, global_batch_size=4,
                          mlm_max_selections_per_seq=8,
                          mpp_max_selections_per_seq=4)
        )

        loader_fn = LoaderShard(MmtPretrainLoader, cfg)

        parallel = list(multiprocess_batches(loader_fn, num_workers=2))
        serial0 = list(loader_fn(0, 2))
        serial1 = list(loader_fn(1, 2))
        assert len(parallel) == len(serial0) + len(serial1)
        # Same multiset of batches (order interleaved round-robin).
        key = lambda b: b["word_ids"].tobytes()  # noqa: E731
        assert sorted(key(b) for b in parallel) == sorted(
            key(b) for b in serial0 + serial1
        )

    def test_zero_workers_passthrough(self, tmp_path):
        from mmt_tpu.data.prefetch import multiprocess_batches

        rng = np.random.default_rng(10)
        vocab = make_vocab(tmp_path)
        path = write_records(str(tmp_path / "z.tfrecord"), 8, rng)
        cfg = MmtPretrainDataConfig(
            **data_kwargs(vocab, input_path=path, tasks="mlm",
                          is_training=False, global_batch_size=4,
                          mlm_max_selections_per_seq=8,
                          mpp_max_selections_per_seq=4)
        )
        out = list(multiprocess_batches(
            lambda s, n: MmtPretrainLoader(cfg).load(s, n), num_workers=0))
        assert len(out) == len(list(MmtPretrainLoader(cfg).load()))


class TestShipRawImages:
    def test_device_patch_path_matches_host(self, tmp_path):
        # ship_raw_images: uint8 images + on-device /255 -> normalize ->
        # extract must reproduce the host patch tensors and model scores.
        import jax
        import jax.numpy as jnp

        from mmt_tpu.features.patches import extract_patches, normalize_image

        rng = np.random.default_rng(12)
        vocab = make_vocab(tmp_path)
        path = write_records(str(tmp_path / "r.tfrecord"), 6, rng,
                             with_indices=True)
        kw = data_kwargs(vocab, input_path=path, global_batch_size=6,
                         is_training=False)
        host = next(iter(MmtRetrievalLoader(
            MmtRetrievalDataConfig(**kw)).load()))
        raw = next(iter(MmtRetrievalLoader(
            MmtRetrievalDataConfig(**kw, ship_raw_images=True)).load()))
        assert "images" in raw and "patch_embeddings" not in raw
        assert raw["images"].dtype == np.uint8
        np.testing.assert_array_equal(host["word_ids"], raw["word_ids"])

        im = jnp.asarray(raw["images"]).astype(jnp.float32) / 255.0
        dev_patches = extract_patches(normalize_image(im), 16)
        np.testing.assert_allclose(
            np.asarray(dev_patches), host["patch_embeddings"],
            atol=1e-6, rtol=1e-6,
        )

    def test_raw_mode_rejects_wrong_size(self, tmp_path):
        from mmt_tpu.data.assembly import ExampleAssembler
        from mmt_tpu.configs.data import MmtDataConfig
        from mmt_tpu.text.wordpiece import BertTokenizer

        vocab = make_vocab(tmp_path)
        asm = ExampleAssembler(
            MmtDataConfig(image_size=64, patch_size=16, max_seq_len=32),
            BertTokenizer(vocab),
        )
        rng = np.random.default_rng(0)
        with pytest.raises(ValueError, match="ship_raw_images"):
            asm.raw_image_u8(png_bytes(rng, size=32))
