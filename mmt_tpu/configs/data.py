"""Data configurations (parity surface: ``src/data/configs.py`` and the
three dataloader configs in ``src/data/*_dataloader.py``)."""

from __future__ import annotations

import dataclasses
from typing import Optional

from mmt_tpu.configs.base import Config


@dataclasses.dataclass
class MmtDataConfig(Config):
    """Shared data config (parity: ``src/data/configs.py:21-55``).

    The reference's ``patch_order: int = 'raster_scan'`` type-annotation bug
    is fixed here (str); behavior unchanged.
    """

    seed: int = 128
    input_path: str = ""
    num_examples: int = 0
    vocab_filename: str = ""
    is_training: bool = True
    global_batch_size: int = 256
    cycle_length: int = 8
    deterministic: bool = True

    image_data_field: str = "image_data"
    text_special_token_field_dict: str = (
        '{"caption_attribution_description": "[ATT]",'
        ' "caption_reference_description":"[REF]"}'
    )
    image_key_field: str = "image_key"
    tasks: str = ""
    patch_size: int = 16
    image_size: int = 224
    patch_order: str = "raster_scan"
    max_pixel_val: int = 256
    max_seq_len: int = 512
    input_channels: int = 3

    relative_pos_max_distance: int = 12
    relative_att_num_core_layers: int = 0

    label_field: Optional[str] = None
    label_weights_field: Optional[str] = None
    logits_field: Optional[str] = None
    pos_weights_field: Optional[str] = None

    # Minimum index shift for ITM negatives (avoids false negatives).
    min_shift: int = 5
    # Post-match example shuffle buffer, so batches mix ITM positives and
    # negatives (reference dataset.shuffle(4096) after unbatching,
    # src/data/pretrain_dataloader.py:213-215).
    shuffle_buffer_size: int = 4096
    use_rand_aug: bool = False
    drop_remainder: bool = True
    # --- TPU-native extension: host input-pipeline worker processes
    # (replaces tf.data's C++ thread pool; 0 = in-process).
    num_workers: int = 0

    # --- TPU-native extension: compute [S,S] side inputs on device from
    # lengths instead of streaming them from host (the reference streams
    # 2 x [S,S] int32 per example; src/input_utils.py:35-40).
    device_side_inputs: bool = True

    # --- TPU-native extension: ship the raw uint8 image and run
    # /255 -> MEAN-normalize -> patch extraction INSIDE the XLA program
    # (fuses into the patch-projection matmul; 4x less host->device
    # traffic than [N, 3p^2] float patches and no host patch work).
    # Supported by all three loaders; pretraining additionally ships a
    # [N] patch_mask and the MPP patch zeroing fuses on device (labels
    # still derive on host from the selected uint8 patches only).
    # Constraints: sources must already be image_size x image_size (the
    # loader raises otherwise -- host resize would reorder the faithful
    # normalize-then-resize float ops) and use_rand_aug must be off
    # (RandAugment runs on host floats).
    ship_raw_images: bool = False

    @property
    def num_patch_per_row(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patch_per_row**2


@dataclasses.dataclass
class MmtPretrainDataConfig(MmtDataConfig):
    """Pretrain data (parity: ``src/data/pretrain_dataloader.py:29-42``)."""

    is_training: bool = True
    mlm_use_whole_word: bool = True
    mlm_fraction_to_mask: float = 0.15
    mpp_fraction_to_mask: float = 0.5
    mlm_max_selections_per_seq: int = 256
    mpp_max_selections_per_seq: int = 98
    output_channel_bits: int = 3
    use_patch_mask_token_id: bool = False
    # Minimum text length filter (examples with fewer wordpieces dropped;
    # src/data/pretrain_dataloader.py:152-163).
    min_text_wordpieces: int = 6


@dataclasses.dataclass
class MmtClassificationDataConfig(MmtDataConfig):
    """Classification data (parity: ``src/data/classification_dataloader.py:30-34``)."""

    negative_positive_ratio: int = 1
    pos_weight: float = 1.0


@dataclasses.dataclass
class MmtRetrievalDataConfig(MmtDataConfig):
    """Retrieval data (parity: ``src/data/retrieval_dataloader.py:30-43``)."""

    is_training: bool = False
    drop_remainder: bool = False
    include_image_text_index: bool = True
    pos_weight: float = 1.0
    # Either paired records (input_path) or an on-the-fly cross product of
    # separate image x text record files.
    image_input_path: str = ""
    text_input_path: str = ""
    num_image_examples: int = 0
    num_text_examples: int = 0
    # Cross-product RAM bound: decoded text features beyond this count
    # are re-streamed from disk per image instead of cached.
    max_cached_text_examples: int = 200_000
