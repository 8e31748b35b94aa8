"""Attention-mask and segment-id side inputs, computed on device.

Re-provides the capability of the reference's
``etcmodel.feature_utils.make_segmented_att_mask`` and the side-input
assembly in ``src/data/data_utils.py:285-380``.

TPU-first redesign: the reference builds a dense ``[S, S]`` int32 mask on
the host CPU per example and streams it to the device
(``src/input_utils.py:35-40``).  The mask is a pure function of the
example's total wordpiece count ``L`` (image + text): token q attends to
token k iff both are real (< L) or both are padding (>= L) -- the latter
being a faithful reproduction of the reference's segmented-mask behavior
where padding tokens share example-id 0 and therefore attend to each
other (harmless: their outputs are never consumed).  So the framework
ships a single int32 per example and expands it on device with jnp.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_segmented_att_mask(example_ids):
    """<int32>[..., S, S] mask where mask[q, k] = example_ids[q] == example_ids[k].

    Mirrors ``etcmodel.feature_utils.make_segmented_att_mask`` (call site
    ``src/data/data_utils.py:322``).  Works for numpy or jnp inputs.
    """
    xp = jnp if isinstance(example_ids, jnp.ndarray) else np
    q = example_ids[..., :, None]
    k = example_ids[..., None, :]
    return (q == k).astype(xp.int32)


def make_example_ids_from_breakpoints(long_breakpoints):
    """Reverse-cumsum of ending breakpoints -> per-token example ids.

    Mirrors ``src/data/data_utils.py:321``.
    """
    xp = jnp if isinstance(long_breakpoints, jnp.ndarray) else np
    rev = xp.flip(long_breakpoints, axis=-1)
    return xp.flip(xp.cumsum(rev, axis=-1), axis=-1)


def make_att_mask_from_length(seq_len: int, length):
    """On-device [S, S] mask from a scalar (or [B]) real-sequence length.

    Equivalent to the reference path: one-hot breakpoint at ``length - 1``
    -> reverse cumsum -> segmented mask (``src/data/data_utils.py:363-375``),
    i.e. real tokens attend among themselves and padding attends among
    itself.

    Args:
      seq_len: static padded sequence length S.
      length: <int32>[] or <int32>[B] number of real tokens.

    Returns:
      <int32>[S, S] or <int32>[B, S, S].
    """
    length = jnp.asarray(length)
    pos = jnp.arange(seq_len, dtype=jnp.int32)
    real = pos[None, :] < length[..., None] if length.ndim else pos < length
    q = real[..., :, None]
    k = real[..., None, :]
    return (q == k).astype(jnp.int32)


def make_segment_ids(seq_len: int, num_image_wordpieces, num_text_wordpieces):
    """On-device segment ids: 1 for image part, 2 for text part, 0 for pad.

    Faithful to ``src/data/data_utils.py:354-361`` including its off-by-one
    quirk: the boundary position ``pos == num_image_wordpieces`` (the first
    text token) gets segment id 0 because the reference uses a strict
    ``position > img_wp`` for the text segment.

    Args:
      seq_len: static padded length S.
      num_image_wordpieces: <int32> scalar or [B].
      num_text_wordpieces: <int32> scalar or [B].

    Returns:
      <int32>[S] or <int32>[B, S].
    """
    img = jnp.asarray(num_image_wordpieces)
    txt = jnp.asarray(num_text_wordpieces)
    pos = jnp.arange(seq_len, dtype=jnp.int32)
    if img.ndim:
        pos = pos[None, :]
        img = img[..., None]
        txt = txt[..., None]
    img_segment = jnp.where(pos < img, 1, 0)
    txt_segment = jnp.where((pos > img) & (pos < img + txt), 2, 0)
    return (img_segment + txt_segment).astype(jnp.int32)
