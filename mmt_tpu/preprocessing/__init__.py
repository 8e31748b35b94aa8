"""Offline preprocessing CLIs: dataset -> TFRecords + input_meta_data JSON.

Parity surface: the reference's ``preprocessing/`` scripts (Fashion-Gen
split/retrieval builders, Flickr30k and WIT inference-data generators),
re-implemented over the framework's dependency-free TFRecord codec.
"""

from mmt_tpu.preprocessing.records import image_example, text_example, get_txt_info  # noqa: F401
