"""Resumable input streams: state()/restore() continues the exact batch
sequence (VERDICT r3 #5).

The reference/TFM never checkpointed tf.data iterators (a preempted run
replays early batches after restart); ``TrainStream`` closes that gap:
snapshots are provenance-based (no example payloads) and restore replays
only the matched batches still alive in the shuffle buffer, header-
hopping everything else (``RecordCursor.seek``).
"""

import pickle

import numpy as np
import pytest

from mmt_tpu.configs.data import (
    MmtClassificationDataConfig,
    MmtPretrainDataConfig,
)
from mmt_tpu.data.loaders import (
    MmtClassificationLoader,
    MmtPretrainLoader,
    RecordCursor,
)
from mmt_tpu.data.tfrecord import TFRecordReader, TFRecordWriter
from tests.test_data_pipeline import data_kwargs, make_vocab, write_records


def _assert_batches_equal(a, b, msg=""):
    assert len(a) == len(b), msg
    for i, (x, y) in enumerate(zip(a, b)):
        assert set(x) == set(y), f"{msg} batch {i} keys"
        for k in x:
            np.testing.assert_array_equal(x[k], y[k], err_msg=f"{msg} batch {i} [{k}]")


class TestRecordCursor:
    def _files(self, tmp_path, n_files=3, per_file=7):
        rng = np.random.default_rng(0)
        paths = []
        for f in range(n_files):
            p = str(tmp_path / f"r{f}.tfrecord")
            with TFRecordWriter(p) as w:
                for i in range(per_file):
                    w.write(f"file{f}_rec{i}".encode() * 20)
            paths.append(p)
        return str(tmp_path / "r*.tfrecord")

    def test_matches_plain_iteration(self, tmp_path):
        pattern = self._files(tmp_path)
        cur = RecordCursor(pattern, 0, 1, seed=11, repeat=True)
        want = []
        c2 = RecordCursor(pattern, 0, 1, seed=11, repeat=True)
        for _ in range(50):
            want.append(next(c2))
        got = [next(cur) for _ in range(50)]
        assert got == want

    @pytest.mark.parametrize("target", [0, 1, 6, 7, 8, 20, 21])
    def test_seek_within_epoch(self, tmp_path, target):
        pattern = self._files(tmp_path)
        ref = RecordCursor(pattern, 0, 1, seed=11, repeat=True)
        skipped = [next(ref) for _ in range(target + 10)][target:]
        cur = RecordCursor(pattern, 0, 1, seed=11, repeat=True)
        cur.seek(0, target)
        got = [next(cur) for _ in range(10)]
        assert got == skipped
        assert cur.state() == ref.state()

    def test_seek_later_epoch_and_forward_again(self, tmp_path):
        pattern = self._files(tmp_path)
        ref = RecordCursor(pattern, 0, 1, seed=11, repeat=True)
        stream = [next(ref) for _ in range(60)]  # ~3 epochs of 21
        cur = RecordCursor(pattern, 0, 1, seed=11, repeat=True)
        cur.seek(2, 5)  # epoch 2 starts at index 42
        assert next(cur) == stream[47]
        cur.seek(2, 10)  # forward seek from a mid-file position
        assert next(cur) == stream[52]

    def test_seek_with_striding_shards(self, tmp_path):
        # 3 files < 4 shards -> record-level striding; pos counts scanned
        # records, so seek must land on this shard's next record.
        pattern = self._files(tmp_path, n_files=3, per_file=5)
        ref = RecordCursor(pattern, 1, 4, seed=3, repeat=True)
        stream = [next(ref) for _ in range(12)]
        cur = RecordCursor(pattern, 1, 4, seed=3, repeat=True)
        cur.seek(0, 9)  # scanned 9 records: shard 1 has consumed 9//4=2 (idx 1,5)
        got = [next(cur) for _ in range(10)]
        assert got == stream[2:]


def _collect(stream, n):
    return [next(stream) for _ in range(n)]


class TestTrainStreamResume:
    @pytest.mark.parametrize("cut", [1, 5, 11])
    def test_pretrain_itm_resume_exact(self, tmp_path, cut):
        vocab = make_vocab(tmp_path)
        rng = np.random.default_rng(1)
        write_records(str(tmp_path / "a.tfrecord"), 13, rng)
        write_records(str(tmp_path / "b.tfrecord"), 9, rng)
        cfg = MmtPretrainDataConfig(
            input_path=str(tmp_path / "*.tfrecord"),
            global_batch_size=8,
            shuffle_buffer_size=12,
            is_training=True,
            tasks="mlm_mpp_itm",
            **data_kwargs(vocab, min_shift=1),
        )
        full = MmtPretrainLoader(cfg).stream()
        want = _collect(full, 20)

        run1 = MmtPretrainLoader(cfg).stream()
        _collect(run1, cut)
        st = pickle.loads(pickle.dumps(run1.state()))

        # A FRESH loader + stream (new process after preemption).
        run2 = MmtPretrainLoader(cfg).stream()
        run2.restore(st)
        got = _collect(run2, 20 - cut)
        _assert_batches_equal(got, want[cut:], "resumed")

    def test_classification_resume_exact(self, tmp_path):
        vocab = make_vocab(tmp_path)
        rng = np.random.default_rng(2)
        write_records(str(tmp_path / "c.tfrecord"), 17, rng)
        cfg = MmtClassificationDataConfig(
            input_path=str(tmp_path / "c.tfrecord"),
            global_batch_size=8,
            negative_positive_ratio=1,
            shuffle_buffer_size=10,
            is_training=True,
            **data_kwargs(vocab, min_shift=1),
        )
        want = _collect(MmtClassificationLoader(cfg).stream(), 12)
        run1 = MmtClassificationLoader(cfg).stream()
        _collect(run1, 7)
        st = pickle.loads(pickle.dumps(run1.state()))
        run2 = MmtClassificationLoader(cfg).stream()
        run2.restore(st)
        _assert_batches_equal(_collect(run2, 5), want[7:], "resumed cls")

    def test_resume_before_any_batch(self, tmp_path):
        vocab = make_vocab(tmp_path)
        rng = np.random.default_rng(3)
        write_records(str(tmp_path / "d.tfrecord"), 12, rng)
        cfg = MmtPretrainDataConfig(
            input_path=str(tmp_path / "d.tfrecord"),
            global_batch_size=8,
            shuffle_buffer_size=6,
            is_training=True,
            tasks="mlm_mpp_itm",
            **data_kwargs(vocab, min_shift=1),
        )
        want = _collect(MmtPretrainLoader(cfg).stream(), 6)
        fresh = MmtPretrainLoader(cfg).stream()
        st = fresh.state()
        run = MmtPretrainLoader(cfg).stream()
        run.restore(st)
        _assert_batches_equal(_collect(run, 6), want, "from step 0")

    def test_snapshot_is_payload_free(self, tmp_path):
        """Snapshots carry provenance, not examples: size stays ~KB even
        though the buffered examples total ~MB."""
        vocab = make_vocab(tmp_path)
        rng = np.random.default_rng(4)
        write_records(str(tmp_path / "e.tfrecord"), 20, rng)
        cfg = MmtPretrainDataConfig(
            input_path=str(tmp_path / "e.tfrecord"),
            global_batch_size=8,
            shuffle_buffer_size=16,
            is_training=True,
            tasks="mlm_mpp_itm",
            **data_kwargs(vocab, min_shift=1),
        )
        s = MmtPretrainLoader(cfg).stream()
        _collect(s, 8)
        blob = pickle.dumps(s.state())
        assert len(blob) < 100_000, len(blob)

    def test_state_mismatch_raises(self, tmp_path):
        vocab = make_vocab(tmp_path)
        rng = np.random.default_rng(5)
        write_records(str(tmp_path / "f.tfrecord"), 8, rng)
        train = MmtPretrainDataConfig(
            input_path=str(tmp_path / "f.tfrecord"),
            global_batch_size=8,
            is_training=True,
            tasks="mlm_mpp_itm",
            **data_kwargs(vocab, min_shift=1),
        )
        ev = MmtPretrainDataConfig(
            input_path=str(tmp_path / "f.tfrecord"),
            global_batch_size=8,
            is_training=False,
            tasks="mlm_mpp_itm",
            **data_kwargs(vocab, min_shift=1),
        )
        s = MmtPretrainLoader(train).stream()
        _collect(s, 1)
        st = s.state()
        with pytest.raises(ValueError, match="does not match"):
            MmtPretrainLoader(ev).stream().restore(st)
