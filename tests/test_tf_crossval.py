"""Cross-validation against TensorFlow (installed in this environment).

Pins the pure-python/numpy re-implementations to the exact TF ops the
reference pipeline uses:

* TFRecord wire format vs tf.io (both directions, incl. CRC checking);
* patch extraction vs tf.image.extract_patches + the reference's
  raster reshape (src/data/data_utils.py:147-180);
* bilinear resize vs tf.image.resize defaults
  (src/data/data_utils.py:206);
* the full normalize(MEAN)/resize composition on a fixed image
  (src/data/data_utils.py:204-206, the divide-by-MEAN quirk).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from mmt_tpu.configs.data import MmtDataConfig
from mmt_tpu.data.assembly import ExampleAssembler
from mmt_tpu.data.tfrecord import (
    TFRecordReader,
    TFRecordWriter,
    build_example,
    parse_example,
)
from mmt_tpu.features.patches import extract_patches, normalize_image
from mmt_tpu.text.wordpiece import BertTokenizer


def _vocab(tmp_path):
    # Patch slots use unused-token ids starting at 104
    # (src/data/data_utils.py:31,108-115), so the vocab must reach there.
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[PATCH]",
              "[ATT]", "[REF]", "a", "b"]
    tokens += [f"[unused{i}]" for i in range(len(tokens), 120)]
    p = tmp_path / "v.txt"
    p.write_text("\n".join(tokens) + "\n")
    return str(p)


def _assembler(tmp_path, image_size=32):
    cfg = MmtDataConfig(
        vocab_filename=_vocab(tmp_path), image_size=image_size, patch_size=16
    )
    return ExampleAssembler(cfg, BertTokenizer(cfg.vocab_filename))


class TestTFRecordWire:
    def test_ours_readable_by_tf(self, tmp_path):
        path = str(tmp_path / "ours.tfrecord")
        payloads = [b"alpha", b"x" * 1000, b""]
        with TFRecordWriter(path) as w:
            for p in payloads:
                w.write(p)
        got = [bytes(r.numpy()) for r in tf.data.TFRecordDataset(path)]
        assert got == payloads

    def test_tf_readable_by_ours(self, tmp_path):
        path = str(tmp_path / "tfs.tfrecord")
        payloads = [b"beta", b"y" * 777]
        with tf.io.TFRecordWriter(path) as w:
            for p in payloads:
                w.write(p)
        assert [bytes(r) for r in TFRecordReader(path, check_crc=True)] == payloads

    def test_byte_identical_files(self, tmp_path):
        """The framing (length + masked CRC32C) must match byte-for-byte."""
        ours, theirs = str(tmp_path / "a.tfr"), str(tmp_path / "b.tfr")
        payloads = [b"gamma", bytes(range(256))]
        with TFRecordWriter(ours) as w:
            for p in payloads:
                w.write(p)
        with tf.io.TFRecordWriter(theirs) as w:
            for p in payloads:
                w.write(p)
        assert open(ours, "rb").read() == open(theirs, "rb").read()

    def test_example_proto_crosses(self, tmp_path):
        feats = {"img": [b"\x89PNG"], "score": [1.25, -3.0], "ids": [7, -2, 0]}
        payload = build_example(feats)
        ex = tf.train.Example()
        ex.ParseFromString(payload)
        assert list(ex.features.feature["img"].bytes_list.value) == [b"\x89PNG"]
        np.testing.assert_allclose(
            list(ex.features.feature["score"].float_list.value), [1.25, -3.0]
        )
        assert list(ex.features.feature["ids"].int64_list.value) == [7, -2, 0]
        # And a TF-serialized proto parses with our parser.
        tf_payload = ex.SerializeToString()
        got = parse_example(tf_payload)
        assert got["ids"] == [7, -2, 0]


class TestPatchExtraction:
    @pytest.mark.parametrize("hw,p", [((32, 32), 16), ((64, 48), 16), ((8, 8), 4)])
    def test_matches_tf_extract_patches(self, hw, p):
        rng = np.random.default_rng(0)
        img = rng.normal(size=hw + (3,)).astype(np.float32)
        got = extract_patches(img, p)
        # Reference composition: tf.image.extract_patches then reshape to
        # [num_patches, p*p*3] (src/data/data_utils.py:147-180).
        tf_patches = tf.image.extract_patches(
            img[None], sizes=[1, p, p, 1], strides=[1, p, p, 1],
            rates=[1, 1, 1, 1], padding="VALID",
        )
        want = tf.reshape(tf_patches, [-1, p * p * 3]).numpy()
        np.testing.assert_array_equal(got, want)


class TestResizeAndNormalize:
    @pytest.mark.parametrize("src", [(50, 70), (224, 224), (17, 223), (448, 448)])
    def test_resize_matches_tf(self, tmp_path, src):
        rng = np.random.default_rng(1)
        img = rng.random(src + (3,)).astype(np.float32)
        asm = _assembler(tmp_path, image_size=32)
        got = asm.resize(img)
        want = tf.image.resize(img, [32, 32]).numpy()  # bilinear defaults
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_normalize_then_resize_composition(self, tmp_path):
        """Full reference composition (src/data/data_utils.py:204-206):
        (im - MEAN) / MEAN  (quirk: divides by MEAN)  then resize."""
        rng = np.random.default_rng(2)
        img = rng.random((40, 56, 3)).astype(np.float32)
        asm = _assembler(tmp_path, image_size=32)
        got = asm.resize(normalize_image(img))

        mean = tf.constant([0.485, 0.456, 0.406])
        tf_norm = (tf.constant(img) - mean) / mean
        want = tf.image.resize(tf_norm, [32, 32]).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_normalize_use_std_variant(self):
        img = np.full((2, 2, 3), 0.5, np.float32)
        got = normalize_image(img, use_std=True)
        want = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225]
        )
        np.testing.assert_allclose(got, np.broadcast_to(want, (2, 2, 3)), rtol=1e-5)
