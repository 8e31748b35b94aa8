"""Data pipeline: TFRecord IO, example assembly, task dataloaders."""

from mmt_tpu.data.tfrecord import (  # noqa: F401
    TFRecordReader,
    TFRecordWriter,
    parse_example,
    build_example,
)
