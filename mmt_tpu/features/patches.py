"""Image patch extraction, normalization, and MPP label construction.

Re-provides the image half of the reference's decode path
(``src/data/data_utils.py:147-239``) and the masked-patch-prediction
label math (``src/data/data_utils.py:448-481``), as pure functions that
run either on host (numpy) or fused into the XLA program (jnp).

TPU-first note: patch extraction is a reshape/transpose, which XLA fuses
with the downstream patch-embedding matmul; the framework therefore
supports shipping the *resized image* to device and extracting patches
on device instead of streaming [196, 768] patch tensors from host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Reference constants (src/data/data_utils.py:33-36).  The reference
# normalizes by the ImageNet MEAN for both centering and scaling -- the
# STD constant is dead code there.  For weight/activation parity the
# default here reproduces that exactly; pass ``use_std=True`` for the
# textbook normalization.
IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)


def normalize_image(image, use_std: bool = False):
    """(im - MEAN) / MEAN  (reference quirk, src/data/data_utils.py:204).

    Args:
      image: <float32>[..., H, W, 3] in [0, 1].
      use_std: divide by STD instead of MEAN (the "correct" variant, off by
        default for parity).
    """
    xp = jnp if isinstance(image, jnp.ndarray) else np
    mean = xp.asarray(IMAGENET_DEFAULT_MEAN, dtype=image.dtype)
    denom = xp.asarray(
        IMAGENET_DEFAULT_STD if use_std else IMAGENET_DEFAULT_MEAN,
        dtype=image.dtype,
    )
    if xp is np:
        # Hot host-pipeline path: same float ops, no temporaries.
        out = np.subtract(image, mean)
        np.true_divide(out, denom, out=out)
        return out
    return (image - mean) / denom


def extract_patches(image, patch_size: int):
    """Non-overlapping patch extraction in raster-scan order.

    Equivalent to ``tf.image.extract_patches`` + raster reshape
    (``src/data/data_utils.py:147-180``): each patch is flattened
    row-major as [py, px, channel], patches ordered row-major over the
    grid.

    Args:
      image: <float>[H, W, C] or <float>[B, H, W, C]; H and W must be
        multiples of ``patch_size``.

    Returns:
      <float>[num_patches, patch_size**2 * C] (or with leading batch dim).
    """
    xp = jnp if isinstance(image, jnp.ndarray) else np
    batched = image.ndim == 4
    if not batched:
        image = image[None]
    b, h, w, c = image.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = image.reshape(b, gh, p, gw, p, c)
    x = xp.transpose(x, (0, 1, 3, 2, 4, 5))  # [B, gh, gw, p, p, C]
    x = x.reshape(b, gh * gw, p * p * c)
    return x if batched else x[0]


def make_mpp_label_ids(
    patch_values,
    patch_size: int,
    channels: int = 3,
    max_pixel_val: int = 256,
    output_channel_bits: int = 3,
):
    """Masked-patch-prediction class labels from raw (unnormalized) patches.

    Faithful to ``src/data/data_utils.py:448-481``: scale [0,1] pixels to
    [0, max_pixel_val-1], mean-pool each patch per channel, bucketize into
    ``2**bits`` equal bins, then combine channels base-``2**bits``:

        label = sum_c bucket_c * (2**bits)**c     in [0, (2**bits)**C)

    Bucketize boundary semantics match ``tf.raw_ops.Bucketize``: value v
    falls in bucket i iff boundaries[i-1] <= v < boundaries[i] (lower
    inclusive).

    Args:
      patch_values: <float>[..., N, patch_size**2 * channels] in [0, 1].

    Returns:
      <int32>[..., N] class ids.
    """
    xp = jnp if isinstance(patch_values, jnp.ndarray) else np
    bin_size = max_pixel_val // (2**output_channel_bits)

    x = patch_values * (max_pixel_val - 1)
    x = x.reshape(*patch_values.shape[:-1], patch_size**2, channels)
    if xp is np:
        # Mean over the middle axis via matmul: ~14x the strided
        # .mean(axis=-2) reduction on host (summation order differs by
        # ulps only; labels are 32-wide buckets).
        ones = np.ones((patch_size**2,), dtype=x.dtype)
        avg = np.matmul(ones, x) / (patch_size**2)
    else:
        avg = x.mean(axis=-2)  # [..., N, C]

    boundaries = xp.arange(bin_size, max_pixel_val, bin_size, dtype=avg.dtype)
    # bucket(v) = number of boundaries <= v  (tf Bucketize: lower-inclusive).
    bucket = (avg[..., None] >= boundaries).sum(axis=-1).astype(xp.int32)

    base = (2**output_channel_bits) ** xp.arange(channels, dtype=xp.int32)
    return (bucket * base).sum(axis=-1).astype(xp.int32)
