"""Pure feature functions: the data contract of the MMT model family.

Everything in this package is a deterministic, shape-static function
suitable for being traced into XLA or executed on host with numpy.
"""

from mmt_tpu.features.relative_position import (  # noqa: F401
    RelativePositionGenerator,
    MmtRelativePositionGenerator,
)
from mmt_tpu.features.attention_mask import (  # noqa: F401
    make_segmented_att_mask,
    make_att_mask_from_length,
    make_segment_ids,
)
from mmt_tpu.features.patches import (  # noqa: F401
    extract_patches,
    normalize_image,
    make_mpp_label_ids,
)
