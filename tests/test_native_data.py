"""Native (C++) data core vs pure-Python codec."""

import numpy as np
import pytest

from mmt_tpu.data import native
from mmt_tpu.data.tfrecord import TFRecordReader, TFRecordWriter, build_example


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library not buildable in this environment")


def test_native_reader_matches_python(tmp_path, lib_ok):
    path = str(tmp_path / "x.tfrecord")
    rng = np.random.default_rng(0)
    payloads = []
    with TFRecordWriter(path) as w:
        for i in range(20):
            p = build_example(
                {
                    "data": [rng.bytes(rng.integers(1, 2000))],
                    "idx": [i],
                    "vals": [float(i), float(i) * 0.5],
                }
            )
            payloads.append(p)
            w.write(p)

    got = list(native.iter_records(path, check_crc=True))
    assert got == payloads
    assert got == list(TFRecordReader(path, check_crc=True))


def test_native_example_fields(tmp_path, lib_ok):
    payload = build_example(
        {
            "name": [b"hello", b"world"],
            "ints": [3, -2, 1 << 40],
            "floats": [1.5, -0.25],
        }
    )
    ex = native.NativeExample(payload)
    assert ex.bytes_feature("name") == [b"hello", b"world"]
    ints = ex.int64_feature("ints")
    np.testing.assert_array_equal(ints, [3, -2, 1 << 40])
    np.testing.assert_allclose(ex.float_feature("floats"), [1.5, -0.25])
    assert ex.bytes_feature("missing") is None
