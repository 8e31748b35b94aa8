"""Fused Pallas TPU kernels: flash attention with ETC/MMT relative bias.

Replaces the reference's compute core (etcmodel
``RelativeTransformerLayers`` dense attention, call site
``src/modeling/models/mmt_encoder.py:220-224``) with a TPU-native design,
forward AND backward (custom VJP), so both inference and training run
fused at long sequence lengths:

* Flash-style online softmax: K/V stream through VMEM tiles; the [S, S]
  logits matrix never exists in HBM.  At S=4096 this turns O(S^2) HBM
  traffic into O(S).
* **No relative-id tensor exists anywhere**: the MMT id scheme (2D patch
  window + clipped 1D text + part padding) is a closed-form function of
  positions, regenerated from index arithmetic only where needed:
    - the |offset| <= D text band arrives via an augmented-table strip
      and ONE strided roll (skew) per head + a single select against the
      clip values -- no per-offset loop;
    - far all-text tiles degenerate to the rank-1 clip value;
    - the 2D image-image block lives in one tile (P^2 <= block); its
      bias is PRECOMPUTED outside the kernel (one exact one-hot
      contraction per (batch, head)) and added unconditionally from a
      zeros-slot fetch buffer whose index map picks the corner slot
      only on tile (0, 0) -- no ``lax.cond`` (Mosaic conds copy their
      hb x [bq, bk] operands/results every grid step: measured
      12.49 -> 8.33 ms/layer dense fwd at 4k; ``MMT_ATTN_IMG=cond``
      restores the round-2 in-kernel select loop, and single-tile
      grids keep it -- see ``_img_mode``);
    - OOV part-padding ids => exactly zero bias (one-hot semantics, a
      multiply-form region mask); in-vocab part ids => rank-1 terms.
  Four heads pack per grid step, sharing every position mask.
* **Cost scales with real length, not padded S**: only real-query x
  real-key tiles run (pad outputs are provably unused; their true
  gradients are exactly zero), and a static far/structured split
  schedule (two list-driven passes + logsumexp combine) is available
  when most tiles are far (`MMT_ATTN_SPLIT`).
* **Attention-probs dropout runs in-kernel** (reference order:
  post-softmax, pre-value contraction) via a deterministic
  multiply-xorshift hash of (seed, example, head, global positions) --
  no PRNG primitive, no [S, S] mask tensor, identical regeneration in
  the backward and across sequence/data shards.
* Padding masks are computed in-kernel from per-example lengths with the
  reference's segmented semantics; masked logits get the additive -10000
  used by the dense XLA path (numerically aligned paths).
* Backward (default ``MMT_ATTN_BWD=fused``): ONE row-major tile sweep
  produces dq + dRelTable + dk + dv; dk/dv accumulate in a full-K VMEM
  scratch written out once per (batch, head-group) slice, deleting the
  two-pass schedule's second logits/bias/exp recompute and its grid's
  fetch slots (measured 49.5 -> 35.8 ms/layer fwd+bwd dense at
  B=8/S=4096, all-cotangents; bit-identical by construction).  A
  head-packing cap (`_backward_head_packing`) shrinks hb when the
  scratch would starve double-buffering (16k).  The split two-pass
  kernels remain as ``MMT_ATTN_BWD=split``.  p is recomputed from the
  saved logsumexp, mirroring the forward bias structure; the dRelTable
  band scatter is the INVERSE skew: mask-multiply, one strided roll
  (stride bk-1 == -1 mod bk -- positive operands only), then one
  constant 0/1 MXU contraction scatters band columns into their vid
  lanes (measured 49.6 -> 42.7 ms/layer fwd+bwd under the old split
  schedule vs the per-offset select loop, which remains as
  MMT_ATTN_DSV=loop and as the narrow-tile fallback).
* Windowed configs run LIST-DRIVEN grids (a scalar-prefetched table
  enumerates only the pattern's live tiles, qi- or ki-sorted), so
  skipped tiles cost neither compute nor a fetch slot: fwd 8.03 vs
  9.67 ms/layer for the rect grid at 4k/window 512, 16.80 vs 22.84 at
  8k -- TPU-verified bit-identical to the rect grid
  (`scripts/window_tpu_smoke.py`); ``MMT_ATTN_WINDOW_GRID=rect``
  reverts.
* Tile metadata is scalar-prefetched as [4, T] (SMEM lane padding makes
  [T, 4] cost 512 B/row -- a 1 MB OOM at 2k tiles).

Numerics: logits, softmax statistics, and accumulators are float32
regardless of input dtype (bfloat16 q/k/v supported).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -10000.0


@dataclasses.dataclass(frozen=True)
class RelGeometry:
    """Static description of the relative-id scheme (hashable, jit-static).

    ``num_core_layers > 0`` => MMT 2D scheme over the first
    ``num_patch_per_row**2`` positions + clipped 1D text after; else the
    ETC 1D scheme over the whole sequence (``image_len == 0``).

    ``window > 0`` additionally restricts the attention PATTERN to
    sliding-window + prefix-global (ETC/Longformer-style; the BASELINE
    long-sequence config): pair (i, j) attends iff ``i < num_global`` or
    ``j < num_global`` or ``|i - j| <= window``.  The upstream etcmodel
    provides this long sparse attention; the reference instantiates only
    the dense stack (``src/modeling/models/mmt_encoder.py:124-135``), so
    this is the rebuild's north-star long-context capability, not a
    parity surface.  Tiles entirely outside the pattern are skipped in
    all four fused kernels, making cost scale O(S·(window + num_global))
    instead of O(S²).
    """

    text_max_distance: int
    num_patch_per_row: int = 0
    num_core_layers: int = 0
    window: int = 0
    num_global: int = 0

    @property
    def image_len(self) -> int:
        return self.num_patch_per_row**2 if self.num_core_layers > 0 else 0

    @property
    def num_image_ids(self) -> int:
        d = 2 * self.num_core_layers + 1
        return d * d + 8

    @property
    def image_part_id(self) -> int:
        return self.image_len + 8 + 2 * self.text_max_distance + 1

    @property
    def text_part_id(self) -> int:
        return self.image_part_id + 1


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def _build_tile_meta(
    geo: RelGeometry, seq_len: int, block_q: int, block_k: int
) -> np.ndarray:
    """Per-tile scalars: [T, 4] = (band_lo, band_hi, has_img, kind).

    band_lo/hi bound the offsets (k - q) in [-D, D] occurring in the tile
    (empty: (1, 0)); has_img marks the image-image tile; kind 0/1 are far
    all-text tiles clipping right/left, kind 2 is the general path.
    """
    d = geo.text_max_distance
    nq, nk = seq_len // block_q, seq_len // block_k
    meta = np.zeros((nq * nk, 4), np.int32)
    for qi in range(nq):
        for ki in range(nk):
            off_min = ki * block_k - (qi * block_q + block_q - 1)
            off_max = ki * block_k + block_k - 1 - qi * block_q
            lo, hi = max(off_min, -d), min(off_max, d)
            if lo > hi:
                lo, hi = 1, 0
            has_img = int(
                geo.image_len > 0
                and qi * block_q < geo.image_len
                and ki * block_k < geo.image_len
            )
            all_text = qi * block_q >= geo.image_len and ki * block_k >= geo.image_len
            if lo > hi and all_text and off_min > d:
                kind = 0
            elif lo > hi and all_text and off_max < -d:
                kind = 1
            else:
                kind = 2
            meta[qi * nk + ki] = (lo, hi, has_img, kind)
    # [4, T] layout: SMEM scalar operands are lane-padded to 128, so a
    # [T, 4] table costs T * 512 B of the 1 MB SMEM (OOM at 2048 tiles);
    # transposed it costs 4 padded rows regardless of T.
    meta = np.ascontiguousarray(meta.T)
    meta.setflags(write=False)  # lru_cached: shared across callers
    return meta


def _build_tile_meta_traced(geo, seq_q, seq_k, block_q, block_k, q_start,
                            k_start=0):
    """jnp version of _build_tile_meta for traced global q/k offsets
    (sequence-sharded / ring attention: the shard owns rows
    [q_start, q_start + seq_q) against keys [k_start, k_start + seq_k))."""
    d = geo.text_max_distance
    nq, nk = seq_q // block_q, seq_k // block_k
    qi = jnp.repeat(jnp.arange(nq, dtype=jnp.int32), nk)
    ki = jnp.tile(jnp.arange(nk, dtype=jnp.int32), nq)
    q0 = q_start + qi * block_q
    k0 = k_start + ki * block_k
    off_min = k0 - (q0 + block_q - 1)
    off_max = k0 + block_k - 1 - q0
    lo = jnp.maximum(off_min, -d)
    hi = jnp.minimum(off_max, d)
    empty = lo > hi
    lo = jnp.where(empty, 1, lo)
    hi = jnp.where(empty, 0, hi)
    img_len = geo.image_len
    has_img = ((q0 < img_len) & (k0 < img_len)).astype(jnp.int32) \
        if img_len else jnp.zeros_like(qi)
    all_text = (q0 >= img_len) & (k0 >= img_len)
    kind = jnp.where(
        empty & all_text & (off_min > d), 0,
        jnp.where(empty & all_text & (off_max < -d), 1, 2),
    )
    return jnp.stack([lo, hi, has_img, kind], axis=0).astype(jnp.int32)


def _image_ids_2d(i_pos, j_pos, geo: RelGeometry):
    """Closed-form 2D patch relative ids (mmt_tpu.features.relative_position)."""
    p = geo.num_patch_per_row
    r = geo.num_core_layers
    d = 2 * r + 1
    ri, ci = i_pos // p, i_pos % p
    rj, cj = j_pos // p, j_pos % p
    dy, dx = rj - ri, cj - ci
    fine = jnp.mod(dy * d + dx, d * d)
    above, below = dy < -r, dy > r
    left, right = dx < -r, dx > r
    mid_y = jnp.logical_not(above | below)
    mid_x = jnp.logical_not(left | right)
    coarse = jnp.zeros_like(fine)
    for idx, m in enumerate(
        [above & mid_x, above & right, mid_y & right, below & right,
         below & mid_x, below & left, mid_y & left, above & left]
    ):
        coarse = jnp.where(m, d * d + idx, coarse)
    in_core = (jnp.abs(dy) <= r) & (jnp.abs(dx) <= r)
    return jnp.where(in_core, fine, coarse)


def _clip_vid(off_val: int, dtd: int) -> int:
    return off_val if off_val >= 0 else dtd - off_val


def _band_vid_order(dtd):
    """Band vid order: column c of the strip holds vid(c - dtd), i.e.
    [2*dtd, 2*dtd-1, ..., dtd+1, 0, 1, ..., dtd] (vid(off) = off for
    off >= 0 else dtd - off)."""
    return [2 * dtd - c for c in range(dtd)] + list(range(dtd + 1))


def _band_bias_rolled(qr, delta, dtd, band0, shape):
    """Band bias via one strided roll (MXU-free skew).

    The relative table passed to the kernel is augmented (``_prepare``)
    with the 2*dtd+1 band ids duplicated in vid order at column
    ``band0``, so ``qr`` already contains the band strip contiguously --
    bit-identical to per-id gathers, with zero extra matmul cost (the
    columns ride the existing v_pad padding).  Row ii of the zero-padded
    strip is rotated by (ii - dtd - delta) so strip column c lands at
    tile column jj with offs(ii, jj) = c - dtd.  In-band positions read
    column offs + dtd (no wrap); out-of-band positions hold wrap garbage
    the caller's select discards.  Requires bk >= 2*dtd+1.
    ``delta`` = k_base - q_base (traced scalar).
    """
    bq, bk = shape
    if _narrow_roll_ok(band0, dtd, bk):
        return _band_bias_rolled_narrow(qr, delta, dtd, band0, shape)
    strip = qr[:, band0:band0 + 2 * dtd + 1]
    padded = jnp.pad(strip, ((0, 0), (0, bk - strip.shape[1])))
    # Normalize the arithmetically-negative rotate into [0, bk): the
    # roll primitive requires a non-negative dynamic shift.
    shift = (-(dtd + jnp.asarray(delta, jnp.int32))) % bk
    return pltpu.roll(padded, shift, 1, stride=1, stride_axis=0)


def _narrow_roll_ok(band0, dtd, bk) -> bool:
    """The mod-128 skew applies when the strip sits inside one 128-lane
    aligned window of qr and bk is a multiple of 128.

    Default on (measured v5e B=8/S=4096 fwd: 17.2 -> 16.1 ms/layer alone,
    and the largest single term of the 17.2 -> 12.0 combined-default win);
    ``MMT_ATTN_BAND=wide`` restores the full-width roll."""
    return (
        os.environ.get("MMT_ATTN_BAND", "narrow") == "narrow"
        and bk % 128 == 0
        and (band0 % 128) + 2 * dtd + 1 <= 128
    )


def _band_bias_rolled_narrow(qr, delta, dtd, band0, shape):
    """Band skew on a 128-lane window, lane-tiled up to the full tile.

    The in-band read position j reads lane j mod 128, and the strided
    roll places strip column c = offs + dtd at exactly that lane for
    every in-band (i, j) (the congruence holds mod 128 because the strip
    is < 128 wide), so in-band values are bit-identical to the full-width
    skew.  Out-of-band lanes hold rotated garbage from the rest of the
    window -- exactly the contract of the wide version, whose wrap
    garbage the caller's select/mask discards.  No zero pad and no extra
    qr columns are needed; the rolled area is 1/(bk/128) of the wide
    roll."""
    bq, bk = shape
    w0 = (band0 // 128) * 128
    window = qr[:, w0:w0 + 128]
    shift = (-(band0 - w0 + dtd + jnp.asarray(delta, jnp.int32))) % 128
    nr = pltpu.roll(window, shift, 1, stride=1, stride_axis=0)
    return jnp.concatenate([nr] * (bk // 128), axis=1)


def _noimg_probe() -> bool:
    """Timing-only probe (MMT_ATTN_NOIMG_PROBE=1): skip the image-id
    lax.conds to size their per-tile operand-copy overhead.  Results are
    WRONG for image-image pairs -- never set outside perf probes."""
    return os.environ.get("MMT_ATTN_NOIMG_PROBE", "0") == "1"


def _imgsub_mode() -> str:
    """MMT_ATTN_IMGSUB: 'mul' computes the image-id loop
    unconditionally on a 128-aligned prefix subtile and gates it with a
    scalar flag multiply; 'cond' runs the subtile under a lax.cond;
    '0' (default until the subtile forms are compile-verified on the
    real Mosaic toolchain) keeps the round-2 full-tile lax.cond."""
    mode = os.environ.get("MMT_ATTN_IMGSUB", "0")
    return {"1": "cond"}.get(mode, mode)


def _img_subtile(img_len, bq, bk) -> Optional[int]:
    """128-aligned square subtile size covering the in-tile image block.

    The image block always starts at local row/col 0 of the (single)
    tile whose meta marks has_img (`_prepare` enforces img_len <= block;
    with a nonzero q_start the local image rows are [0, img_len -
    q_start) -- still a prefix), so restricting the image-id work to a
    [sub, sub] prefix is exact.  The measured point (NOIMG probe, v5e
    B=8/S=4096): the full-tile cond's hb x [bq, bk] operand/result
    copies cost ~4-5 ms/layer on tiles that never take the branch;
    shrinking the work to the subtile recovers most of it.  Returns
    None (fall back to the full-tile cond) when the 128-aligned prefix
    doesn't fit the tile, or under MMT_ATTN_IMGSUB=0."""
    if _imgsub_mode() == "0":
        return None
    sub = -(-img_len // 128) * 128
    if sub > bq or sub > bk:
        return None
    return sub


def _prefix_add(x, add):
    """``x[:sq, :sk] += add`` rebuilt from static slices + concatenation
    (``dynamic_update_slice`` has no Mosaic TC lowering)."""
    sq, sk = add.shape
    top = x[:sq, :sk] + add
    if x.shape[1] > sk:
        top = jnp.concatenate([top, x[:sq, sk:]], axis=1)
    if x.shape[0] > sq:
        top = jnp.concatenate([top, x[sq:]], axis=0)
    return top


def _apply_image_bias(biases, qrs, meta_ref, t, q_base, k_base, shape, geo,
                      rel_vocab):
    """Add the image-image 2D-relative-id bias onto the has_img tile.

    bias[i, j] += qr[i, ids2d(i_pos, j_pos)] for image x image pairs --
    a per-position vocab gather, built as a per-id select loop (Mosaic
    has no dynamic gather).  The loop only ever contributes on the one
    tile carrying the image block; with a 128-aligned prefix subtile
    available it runs on the [sub, sub] prefixes instead of the full
    packed tiles -- unconditionally under a scalar flag multiply
    ('mul', default: the image mask is already exactly 0 off the image
    tile since tile bases are block multiples and img_len <= block, so
    the flag multiply is belt-and-braces, not load-bearing) or under a
    lax.cond
    ('cond'); see _imgsub_mode/_img_subtile."""
    img_len = geo.image_len
    if _noimg_probe():
        return list(biases)
    nvid = min(geo.num_image_ids, rel_vocab)
    sub = _img_subtile(img_len, shape[0], shape[1])
    if sub is not None:
        qrs_sub = [qr[:sub] for qr in qrs]
        dtype = biases[0].dtype

        def image_add_sub(flagf):
            shp = (sub, sub)
            i_pos = q_base + jax.lax.broadcasted_iota(jnp.int32, shp, 0)
            j_pos = k_base + jax.lax.broadcasted_iota(jnp.int32, shp, 1)
            ids2d = _image_ids_2d(i_pos, j_pos, geo)
            imaskf = ((i_pos < img_len) & (j_pos < img_len)).astype(dtype)
            if flagf is not None:
                imaskf = imaskf * flagf
            outs = []
            for qr in qrs_sub:
                add = jnp.zeros(shp, dtype)
                for vid in range(nvid):
                    add = add + jnp.where(
                        ids2d == vid, qr[:, vid][:, None], 0.0
                    )
                outs.append(add * imaskf)
            return tuple(outs)

        if _imgsub_mode() == "mul":
            adds = image_add_sub((meta_ref[2, t] == 1).astype(dtype))
        else:
            adds = jax.lax.cond(
                meta_ref[2, t] == 1, lambda: image_add_sub(None),
                lambda: tuple(jnp.zeros((sub, sub), dtype) for _ in qrs),
            )
        return [_prefix_add(b, a) for b, a in zip(biases, adds)]

    def image_bias(biases):
        i_pos = q_base + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        j_pos = k_base + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ids2d = _image_ids_2d(i_pos, j_pos, geo)
        imask = (i_pos < img_len) & (j_pos < img_len)
        out = []
        for qr, bias in zip(qrs, biases):
            add = jnp.zeros_like(bias)
            for vid in range(nvid):
                add = add + jnp.where(ids2d == vid, qr[:, vid][:, None], 0.0)
            out.append(bias + jnp.where(imask, add, 0.0))
        return tuple(out)

    return list(jax.lax.cond(
        meta_ref[2, t] == 1, image_bias, lambda bs: tuple(bs), tuple(biases),
    ))


def _tile_bias_multi(qrs, meta_ref, t, q_base, k_base, shape, geo, rel_vocab,
                     block_q, block_k, skip_image=False):
    """Relative bias tiles for a list of per-head qr matrices.

    ``skip_image=True`` omits the image-image 2D-id contribution (the
    caller adds it from a precomputed corner fetch -- ``MMT_ATTN_IMG``);
    the region select/multiply that ZEROES non-text pairs still runs.

    Lean assembly shared across the packed heads: one sublane/lane
    index-difference tile, scalar-shifted compares (no materialized
    offs/text_pair), the whole band via one strided roll per head, and a
    single select chain.  Every elementwise pass over a [bq, bk] tile
    costs real VPU time, so all head-independent masks are computed once
    and per-tile lax.conds are shared by all heads.  There is no
    far-tile special case: on an all-text far tile every position
    satisfies right (or left), so the chain degenerates to exactly the
    rank-1 edge value -- and a measured far-tile lax.cond branch loses
    to the unconditional chain (cond operand/result copies of the packed
    bias tiles outweigh the skipped work).
    """
    dtd = geo.text_max_distance
    img_len = geo.image_len
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    jmi = jj - ii  # offs = delta + jmi, delta = k_base - q_base
    delta = k_base - q_base
    right = jmi > dtd - delta
    left = jmi < -dtd - delta
    rl = right | left
    fast = shape[1] >= 2 * dtd + 1
    # Measured on v5e at B=8/S=4096: select 17.46 vs mul2 18.12 ms/layer
    # (sublane->lane broadcasts, not selects, are the expensive primitive
    # and mul2 has more of them) -- the select chain is the default and
    # mul2 stays behind the env flag.
    mul2 = fast and os.environ.get("MMT_ATTN_BIAS", "select") == "mul2"

    if mul2:
        # Multiply-form chain: a [bq, bk] select costs ~5x a multiply on
        # this compiler and the ev lane-broadcast select was the single
        # most expensive bias op, so decompose the text bias as
        #   left_clip  (everywhere text x text; rank-1 broadcast-mul)
        # + (band - left_clip) * band_mask   (skew-rolled strip, pre-
        #                                     subtracted so it's a pure
        #                                     correction; the mask also
        #                                     kills the roll wrap)
        # + (right_clip - left_clip) * right_mask.
        # All i1->f32 mask converts are tile-level and shared by every
        # packed head; per-head work is 3 multiplies + 2 adds.
        f32 = jnp.float32
        band = jnp.logical_not(rl)
        if img_len:
            ti = ii >= img_len - q_base
            tj = jj >= img_len - k_base
            ti_col = (
                jax.lax.broadcasted_iota(jnp.int32, (shape[0], 1), 0)
                >= img_len - q_base
            ).astype(f32)
            tj_row = (
                jax.lax.broadcasted_iota(jnp.int32, (1, shape[1]), 1)
                >= img_len - k_base
            ).astype(f32)
            band_tt = (band & ti & tj).astype(f32)
            right_tt = (right & ti & tj).astype(f32)
        else:
            ti_col = jnp.ones((shape[0], 1), f32)
            tj_row = jnp.ones((1, shape[1]), f32)
            band_tt = band.astype(f32)
            right_tt = right.astype(f32)
        biases = []
        shift = (-(dtd + jnp.asarray(delta, jnp.int32))) % shape[1]
        for qr in qrs:
            qr_l = qr[:, 2 * dtd]  # left-clip value, [bq]
            qrd = qr[:, dtd] - qr_l  # right-clip minus left-clip, [bq]
            strip = qr[:, rel_vocab:rel_vocab + 2 * dtd + 1] - qr_l[:, None]
            padded = jnp.pad(
                strip, ((0, 0), (0, shape[1] - strip.shape[1]))
            )
            rolled = pltpu.roll(padded, shift, 1, stride=1, stride_axis=0)
            base = (qr_l[:, None] * ti_col) * tj_row
            biases.append(
                base + rolled * band_tt + qrd[:, None] * right_tt
            )
        if img_len and (
            geo.text_part_id < rel_vocab or geo.image_part_id < rel_vocab
        ):
            # In-vocab part ids: two more rank-1 broadcast-mul terms
            # (cross = where(ti, image_part, text_part), one-hot form).
            out = []
            for qr, bias in zip(qrs, biases):
                if geo.image_part_id < rel_vocab:
                    bias = bias + (
                        qr[:, geo.image_part_id][:, None] * ti_col
                    ) * (1.0 - tj_row)
                if geo.text_part_id < rel_vocab:
                    bias = bias + (
                        qr[:, geo.text_part_id][:, None] * (1.0 - ti_col)
                    ) * tj_row
                out.append(bias)
            biases = out

        if img_len and not skip_image:
            biases = _apply_image_bias(
                biases, qrs, meta_ref, t, q_base, k_base, shape, geo,
                rel_vocab,
            )
        return biases

    biases = []
    for qr in qrs:
        ev = jnp.where(right, qr[:, dtd][:, None], qr[:, 2 * dtd][:, None])
        if fast:
            # Band values land in-place via the skew roll; out-of-band
            # positions (incl. the roll's wrap-around) select the edge
            # value instead, so no band mask and no cond are needed.
            rolled = _band_bias_rolled(qr, delta, dtd, rel_vocab, shape)
            biases.append(jnp.where(rl, ev, rolled))
        else:
            biases.append(jnp.where(rl, ev, 0.0))

    if not fast:
        # Narrow-tile fallback (tests at tiny blocks): per-offset select
        # loop, gated on the tile actually meeting the band.
        def band_bias(biases):
            offs = jmi + delta
            abs_offs = jnp.abs(offs)
            pos = offs > 0
            out = []
            for qr, bias in zip(qrs, biases):
                add = jnp.where(offs == 0, qr[:, 0][:, None], 0.0)
                for d_val in range(1, dtd + 1):
                    val = jnp.where(pos, qr[:, d_val][:, None],
                                    qr[:, dtd + d_val][:, None])
                    add = add + jnp.where(abs_offs == d_val, val, 0.0)
                out.append(bias + add)
            return tuple(out)

        biases = list(jax.lax.cond(
            meta_ref[0, t] <= meta_ref[1, t], band_bias,
            lambda bs: tuple(bs), tuple(biases),
        ))

    if img_len:
        # Region select: text-text pairs keep the 1D bias; cross pairs
        # get the part-id bias (zero when the part ids are out of vocab,
        # the flagship case); image-image pairs get the 2D ids (one
        # tile, under a cond shared by all heads).
        ti = ii >= img_len - q_base  # i_pos >= img_len
        tj = jj >= img_len - k_base
        tt = ti & tj
        if geo.text_part_id < rel_vocab or geo.image_part_id < rel_vocab:
            xor = ti ^ tj
            sel = []
            for qr, bias in zip(qrs, biases):
                tpart = (
                    qr[:, geo.text_part_id][:, None]
                    if geo.text_part_id < rel_vocab else jnp.float32(0.0)
                )
                ipart = (
                    qr[:, geo.image_part_id][:, None]
                    if geo.image_part_id < rel_vocab else jnp.float32(0.0)
                )
                cross = jnp.where(ti, ipart, tpart)
                sel.append(jnp.where(tt, bias, jnp.where(xor, cross, 0.0)))
            biases = sel
        else:
            # Multiply form: measured ~15% cheaper than the select on the
            # remote Mosaic compiler (the i1->f32 convert is shared across
            # heads; a [bq, bk] select costs ~5x a multiply).
            ttf = tt.astype(biases[0].dtype)
            biases = [bias * ttf for bias in biases]

        if not skip_image:
            biases = _apply_image_bias(
                biases, qrs, meta_ref, t, q_base, k_base, shape, geo,
                rel_vocab,
            )
    return biases


def _hbm_bias_on(geometry, rel_vocab, block_q, block_k, static_offsets,
                 square) -> bool:
    """``MMT_ATTN_BIAS=hbm``: precomputed bias-slot fetch (VERDICT r4 #1).

    Instead of regenerating the relative bias on the VPU every grid step
    (the measured ~6.8 ms/layer chain at the 4k flagship), the bias is
    materialized OUTSIDE the kernel by plain XLA -- where the vocab
    gather is a native op -- but only for the tile classes whose content
    is not row-constant: per (batch, head, q-block) the 4 "structured"
    slots {key-block 0, q-block-1, q-block, q-block+1} (the 25-diagonal
    text band, the 2D image corner, and the image/text boundary columns
    all live there).  Every other tile's bias is constant along each
    query row (the far clip / part value), so it rides the flash row
    statistics at zero per-element cost (the ``far_only`` mechanism).
    The kernel fetches one [hb, bq, bk] slot per grid step through a
    clamped index map -- consecutive far steps map to the same slot and
    Mosaic elides the refetch, so a q-row costs exactly 4 fetches.
    Requires the fast band path (block_k >= 2*dtd+1) and static offsets;
    dense pattern only (the windowed list grid keeps the in-kernel
    chain)."""
    if os.environ.get("MMT_ATTN_BIAS", "select") != "hbm":
        return False
    return (
        rel_vocab > 0
        and geometry is not None
        and geometry.window == 0
        and static_offsets
        and square
        and block_q == block_k  # slot set {ki-1,ki,ki+1} assumes square
        and block_k >= 2 * geometry.text_max_distance + 1
    )


def _hbm_store_dtype():
    """Slot-buffer dtype: bf16 (default -- halves build+fetch bytes; adds
    one rounding the in-kernel chain does not have, ~1e-2 absolute on
    O(1) bias values, same order as the bf16 q/k rounding already in the
    logits) or f32 (``MMT_ATTN_HBM_DTYPE=f32``)."""
    return (
        jnp.float32
        if os.environ.get("MMT_ATTN_HBM_DTYPE", "bf16") == "f32"
        else jnp.bfloat16
    )


def _hbm_slot_index(qi, ki):
    """Slot for grid step (qi, ki): 0 = key-block 0, 1/2/3 = key blocks
    qi-1/qi/qi+1.  Far steps clamp to the nearest slot (content unused --
    the kernel's flag multiply zeroes it) so the mapped index changes only
    3 times per q-row and Mosaic skips the no-op refetches."""
    near = 1 + jnp.clip(ki - qi + 1, 0, 2)
    return jnp.where(ki < qi - 1, 0, near)


def _full_bias_vids(i_pos, j_pos, geo: RelGeometry):
    """Closed-form relative-att id for arbitrary position grids (jnp;
    broadcasts).  Mirrors ``_tile_bias_multi``'s select-chain semantics
    exactly: text band vid(o) = o for 0<=o<=dtd else dtd-o, clipped at
    dtd/2*dtd; image-image pairs use the 2D ids; cross pairs the part
    ids (i-text x j-image -> image_part_id, per the reference layout).
    OOV ids (>= vocab) are the caller's to zero."""
    dtd = geo.text_max_distance
    off = j_pos - i_pos
    vid = jnp.where(
        off >= 0, jnp.minimum(off, dtd), jnp.minimum(dtd - off, 2 * dtd)
    )
    img_len = geo.image_len
    if img_len:
        t_i = i_pos >= img_len
        t_j = j_pos >= img_len
        ids2d = _image_ids_2d(i_pos, j_pos, geo)
        vid = jnp.where(
            t_i & t_j, vid,
            jnp.where(
                jnp.logical_not(t_i | t_j), ids2d,
                jnp.where(t_i, geo.image_part_id, geo.text_part_id),
            ),
        )
    return vid


def _build_bias_slots(qt, rel_h, geo: RelGeometry, rel_vocab, block_q,
                      block_k, nq, hb, softmax_scale):
    """XLA-side bias-slot buffer for ``MMT_ATTN_BIAS=hbm``.

    qt: [B, H, S, D]; rel_h: [H, v_pad, D] (augmented table -- only the
    first ``rel_vocab`` columns are read).  Returns
    [B, H//hb, nq, 4, hb, bq, bk] in ``_hbm_store_dtype()``: the FULL
    relative bias of the 4 structured key-block slots per q-block
    (slot 0 = key-block 0, slots 1..3 = key blocks qi-1..qi+1).

    The vocab gather is phrased as ONE-HOT MXU CONTRACTIONS, never an
    element gather (measured: ``take_along_axis`` along the minor dim
    runs ~0.4 G elements/s on this toolchain -- 230 ms for an S=1024
    buffer).  One-hot sums are exact (exactly one 1.0 per row; adding
    zeros is exact), so the f32 path is bit-identical to a gather.
    Three map families keep the one-hot tensors small and qi-shared:

    * slots 1..3 away from the image block depend on positions only
      through the offset j - i + (s-2)*bk: one [3, bq, V, bk] map batched
      over rows, shared by every (batch, head, q-block);
    * slot 0 (far-left key block 0) is row-independent: a plain [V, bk]
      matmul;
    * the <=3 (q-block, slot) combos touching the image block (the 2D
      corner and the image/text boundary) are overwritten with exact
      per-position maps via small per-q-block contractions.

    Prescale folds the pow2 softmax scale into q exactly like the
    kernel does; bf16 mode rounds qr to bf16 before the one-hot sum
    (one rounding vs the in-kernel f32 chain)."""
    B, H, S, D = qt.shape
    hg = H // hb
    store = _hbm_store_dtype()
    if _prescale_on(softmax_scale):
        qt = qt * jnp.asarray(softmax_scale, qt.dtype)
    qr = jnp.einsum(
        "bhsd,hvd->bhsv", qt, rel_h[:, :rel_vocab],
        preferred_element_type=jnp.float32,
    )  # [B, H, S, V]
    # Target layout directly (hb inside the block, before bq): only the
    # small qr tensor is transposed, never the ~100x larger slot buffer.
    qr = qr.reshape(B, hg, hb, nq, block_q, rel_vocab)
    qr = qr.transpose(0, 1, 3, 2, 4, 5)  # [B, HG, nq, hb, bq, V]
    if store == jnp.bfloat16 and jax.default_backend() == "tpu":
        # bf16 x one-hot on the MXU.  Identical to the f32 contraction +
        # bf16 store (one-hot sums are exact; bf16(bf16(x)) == bf16(x)),
        # so CPU -- whose dot thunk lacks bf16 x bf16 -> f32 -- just
        # keeps f32 operands.
        qr = qr.astype(jnp.bfloat16)

    dtd = geo.text_max_distance
    il = geo.image_len
    varange = jnp.arange(rel_vocab, dtype=jnp.int32)
    iota_i = jnp.arange(block_q, dtype=jnp.int32)[:, None]
    iota_j = jnp.arange(block_k, dtype=jnp.int32)[None, :]

    def text_vid(off):
        return jnp.where(
            off >= 0, jnp.minimum(off, dtd), jnp.minimum(dtd - off, 2 * dtd)
        )

    # Generic slots 1..3: pure-text band/clip maps, one per slot offset.
    deltas = jnp.asarray([-block_k, 0, block_k], jnp.int32)[:, None, None]
    gen_vid = text_vid(iota_j - iota_i + deltas)  # [3, bq, bk]
    oh_gen = (gen_vid[:, :, None, :] == varange[:, None]).astype(qr.dtype)
    out_g = jnp.einsum(
        "bgnhiv,sivj->bgnshij", qr, oh_gen,
        preferred_element_type=jnp.float32,
    ).astype(store)  # [B, HG, nq, 3, hb, bq, bk]

    # Slot 0: key block 0 seen from a far-right q block -- every q row is
    # text, so the map is row-independent: left clip on text keys, the
    # image part id (OOV => no match => zero) on image keys.
    vid0 = jnp.full((block_k,), 2 * dtd, jnp.int32)
    if il:
        vid0 = jnp.where(iota_j[0] < il, geo.image_part_id, vid0)
    oh0 = (varange[:, None] == vid0[None, :]).astype(qr.dtype)  # [V, bk]
    out_0 = jnp.einsum(
        "bgnhiv,vj->bgnhij", qr, oh0, preferred_element_type=jnp.float32,
    ).astype(store)[:, :, :, None]  # [B, HG, nq, 1, hb, bq, bk]

    out = jnp.concatenate([out_0, out_g], axis=3)

    if il:
        # Exact overwrites for the (q-block, slot) combos whose tile
        # touches the image block: (0, slot2)=tile(0,0) with the 2D
        # corner, (0, slot3)=tile(0,1) image rows x text keys, and
        # (1, slot1)=tile(1,0) text rows x image keys.
        specials = {(0, 2): 0}
        if nq > 1:
            specials[(0, 3)] = 1
            specials[(1, 1)] = 0
        for (qi_s, s_s), ki_s in specials.items():
            i_pos = qi_s * block_q + iota_i
            j_pos = ki_s * block_k + iota_j
            vid = _full_bias_vids(i_pos, j_pos, geo)  # [bq, bk]
            oh = (vid[:, None, :] == varange[:, None]).astype(qr.dtype)
            tile = jnp.einsum(
                "bghiv,ivj->bghij", qr[:, :, qi_s], oh,
                preferred_element_type=jnp.float32,
            ).astype(store)
            out = out.at[:, :, qi_s, s_s].set(tile)
    return out


def _img_mode() -> str:
    """``MMT_ATTN_IMG``: how the image-image 2D-id bias reaches the
    kernels.  ``fetch`` (default): the [img_len, img_len] corner
    contribution is precomputed OUTSIDE the kernel (one tiny exact
    one-hot contraction) and added unconditionally from a two-slot
    buffer whose slot 0 is zeros -- the index map selects the corner
    slot only on the (0, 0) tile, so every other step adds exact 0.0
    and NO ``lax.cond`` exists in the kernel (Mosaic conds copy their
    hb x [bq, bk] operands/results every grid step: measured 12.49 ->
    8.33 ms/layer dense fwd at B=8/S=4096, at the 8.09 NOIMG-probe
    bound).  ``cond`` restores the
    round-2 in-kernel select-loop under ``lax.cond`` (and with it the
    ``MMT_ATTN_IMGSUB`` experiments).  ``fetch1`` forces the fetch even
    on single-tile grids (nq == nk == 1, where no zeros slot is needed)
    -- measured SLOWER there (23.26 vs 16.08 ms/layer at S=256/B=512:
    the 1.6 GB/layer corner build+fetch round trip exceeds the
    in-kernel loop it replaces at large batch), kept for probes."""
    return os.environ.get("MMT_ATTN_IMG", "fetch")


def _imgfetch_applicable(geometry, rel_vocab, static_offsets,
                         nq=2, nk=2) -> bool:
    """Fetch pays only when most grid steps DON'T contain the corner:
    at nq == nk == 1 (short-S single-tile grids) the old ``lax.cond``
    fired on every step anyway -- no copies were wasted -- while the
    fetch adds a per-layer [2, B, HG, hb, bq, bk] build that scales
    with batch (measured: S=256/B=512 inference 1290 -> 984 ex/s).
    Keep the cond there; fetch everywhere else."""
    mode = _img_mode()
    return (
        rel_vocab > 0
        and geometry is not None
        and geometry.image_len > 0
        and static_offsets
        and (nq * nk > 1 or mode == "fetch1")
        and mode in ("fetch", "fetch1")
    )


def _build_img_corner(qt, rel_h, geo: RelGeometry, rel_vocab, block_q,
                      block_k, hb, softmax_scale):
    """[B*(H//hb) + 1, hb, bq, bk] float32: slot 0 ONE shared zeros
    tile, slot 1 + b*(H//hb) + hgrp the image-image 2D-relative-id bias
    contribution of tile (0, 0) for that (batch, head-group), padded
    with zeros outside the [img_len, img_len] corner.  Sharing the
    zeros slot across (b, hgrp) halves the per-layer build write
    (805 -> ~406 MB at the B=32 flagship).

    Exactly ``_apply_image_bias``'s addend: qr[i, ids2d(i, j)] for
    image x image pairs with in-vocab ids, 0 elsewhere -- computed as a
    one-hot f32 contraction (exact: one 1.0 per row, adding zeros is
    exact), so fetch-mode results are bit-identical to the in-kernel
    select loop.  Prescale folds the pow2 softmax scale into q exactly
    like the kernel does."""
    B, H, S, D = qt.shape
    hg = H // hb
    il = geo.image_len
    if _prescale_on(softmax_scale):
        qt = qt * jnp.asarray(softmax_scale, qt.dtype)
    nvid = min(geo.num_image_ids, rel_vocab)
    qr = jnp.einsum(
        "bhid,hvd->bhiv", qt[:, :, :il], rel_h[:, :nvid],
        preferred_element_type=jnp.float32,
    )  # [B, H, il, nvid]
    iota = jnp.arange(il, dtype=jnp.int32)
    ids2d = _image_ids_2d(iota[:, None], iota[None, :], geo)  # [il, il]
    oh = (
        ids2d[:, None, :] == jnp.arange(nvid, dtype=jnp.int32)[:, None]
    ).astype(jnp.float32)  # [il, nvid, il]
    corner = jnp.einsum(
        "bhiv,ivj->bhij", qr, oh, preferred_element_type=jnp.float32,
    )  # [B, H, il, il]
    corner = jnp.pad(
        corner, ((0, 0), (0, 0), (0, block_q - il), (0, block_k - il))
    ).reshape(B * hg, hb, block_q, block_k)
    zeros = jnp.zeros((1, hb, block_q, block_k), jnp.float32)
    return jnp.concatenate([zeros, corner])


def _tile_dsv_multi(dss, meta_ref, t, q_base, k_base, v_pad, geo, rel_vocab,
                    block_q, block_k):
    """Multi-head ``_tile_dsv``: one set of position masks (iotas,
    compares, i1->f32 converts) shared by all packed heads; the per-head
    work is a multiply + row-sum per id class (multiply form -- a
    [bq, bk] select costs ~5x a multiply on this compiler)."""
    dtype = dss[0].dtype
    dtd = geo.text_max_distance
    img_len = geo.image_len
    bq = dss[0].shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bq, v_pad), 1)

    def col(vid, rowsum):
        return jnp.where(lane == vid, rowsum[:, None], 0.0)

    def far_dsv():
        is_right = (meta_ref[3, t] == 0).astype(dtype)
        out = []
        for ds in dss:
            rowsum = jnp.sum(ds, axis=1)
            out.append(col(dtd, rowsum * is_right)
                       + col(2 * dtd, rowsum * (1.0 - is_right)))
        return tuple(out)

    # Unconditional schedule (MMT_ATTN_DSV_SCHED=uncond): run the general
    # path on every tile with no far/band lax.cond.  Exact on far tiles:
    # the band mask ``bandf`` is identically 0 there (all |offs| > dtd),
    # the right/left edge masks partition the whole tile (a tile whose
    # offset range contains both sides necessarily meets the band and is
    # classified structured), and the image/part masks are 0 off the
    # image block.  Trades the conds' per-tile operand/result copies for
    # the band multiply+roll+MXU contraction on far tiles.
    uncond = (
        os.environ.get("MMT_ATTN_DSV_SCHED", "cond") == "uncond"
        and dss[0].shape[1] >= 2 * dtd + 1
        and os.environ.get("MMT_ATTN_DSV", "mxu") == "mxu"
    )

    def general_dsv():
        shape = dss[0].shape
        i_pos = q_base + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        j_pos = k_base + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        offs = j_pos - i_pos
        if img_len:
            tpf = ((i_pos >= img_len) & (j_pos >= img_len)).astype(dtype)
            ds_ts = [ds * tpf for ds in dss]
        else:
            ds_ts = list(dss)

        rightf = (offs > dtd).astype(dtype)
        leftf = (offs < -dtd).astype(dtype)
        dsvs = [
            col(dtd, jnp.sum(ds_t * rightf, axis=1))
            + col(2 * dtd, jnp.sum(ds_t * leftf, axis=1))
            for ds_t in ds_ts
        ]

        bk = dss[0].shape[1]
        mxu_dsv = (
            bk >= 2 * dtd + 1
            and os.environ.get("MMT_ATTN_DSV", "mxu") == "mxu"
        )

        def band_dsv(dsvs):
            if not mxu_dsv:
                out = list(dsvs)
                for off_val in range(-dtd, dtd + 1):
                    vid = _clip_vid(off_val, dtd)
                    mf = (offs == off_val).astype(dtype)
                    for hh, ds_t in enumerate(ds_ts):
                        out[hh] = out[hh] + col(vid, jnp.sum(ds_t * mf, axis=1))
                return tuple(out)
            # MXU form: dsv[i, vid(o)] = sum_j ds[i, j][j - i + delta == o]
            # is a per-row diagonal gather -- the INVERSE of the forward
            # skew.  Deskew with one strided roll (stride bk-1 == -1 mod
            # bk, positive operands only: the negative-stride primitive
            # is rejected by the remote compiler) so band offset o lands
            # in column o + dtd, then scatter columns [0, 2*dtd] into
            # their vid lanes with ONE constant 0/1 MXU contraction --
            # replacing 25 per-offset convert/mul/rowsum/lane-scatter
            # passes per tile.
            bandf = ((offs >= -dtd) & (offs <= dtd)).astype(dtype)
            shift = (dtd + jnp.asarray(k_base - q_base, jnp.int32)) % bk
            rr = jax.lax.broadcasted_iota(jnp.int32, (bk, v_pad), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (bk, v_pad), 1)
            # row r (band column o = r - dtd) -> lane vid(o): o for o >= 0
            # else dtd - o.  The select runs on int32 operands -- a
            # where() over booleans emits an i8->i1 trunci the remote
            # Mosaic compiler rejects ("Unsupported target bitwidth
            # for truncation").
            vid_of_r = jnp.where(rr >= dtd, rr - dtd, 2 * dtd - rr)
            pmat = ((rr <= 2 * dtd) & (cc == vid_of_r)).astype(dtype)
            out = []
            for dsv, ds_t in zip(dsvs, ds_ts):
                deskew = pltpu.roll(
                    ds_t * bandf, shift, 1, stride=bk - 1, stride_axis=0
                )
                out.append(dsv + jax.lax.dot_general(
                    deskew, pmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            return tuple(out)

        if uncond:
            dsvs = band_dsv(tuple(dsvs))
        else:
            dsvs = jax.lax.cond(
                meta_ref[0, t] <= meta_ref[1, t], band_dsv,
                lambda x: tuple(x), tuple(dsvs),
            )

        if img_len and not _noimg_probe():
            nvid = min(geo.num_image_ids, rel_vocab)
            sub = _img_subtile(img_len, shape[0], shape[1])
            if sub is not None:
                # Subtile form (see _img_subtile): the image block is a
                # [sub, sub] prefix of the has_img tile, so the image-id
                # loop runs on the ds prefixes and lands [sub, v_pad]
                # dsv adds -- not the full packed tiles.  'mul' mode
                # computes it unconditionally under a scalar has_img
                # flag multiply; 'cond' wraps it in a lax.cond.
                ds_subs = [ds[:sub, :sub] for ds in dss]
                lane_s = jax.lax.broadcasted_iota(jnp.int32, (sub, v_pad), 1)

                def image_dsv_sub(flagf):
                    shp = (sub, sub)
                    i_s = q_base + jax.lax.broadcasted_iota(jnp.int32, shp, 0)
                    j_s = k_base + jax.lax.broadcasted_iota(jnp.int32, shp, 1)
                    ids2d = _image_ids_2d(i_s, j_s, geo)
                    imf = ((i_s < img_len) & (j_s < img_len)).astype(dtype)
                    if flagf is not None:
                        imf = imf * flagf
                    outs = []
                    for ds_s in ds_subs:
                        ds_i = ds_s * imf
                        add = jnp.zeros((sub, v_pad), dtype)
                        for vid in range(nvid):
                            mf = (ids2d == vid).astype(dtype)
                            add = add + jnp.where(
                                lane_s == vid,
                                jnp.sum(ds_i * mf, axis=1)[:, None], 0.0,
                            )
                        outs.append(add)
                    return tuple(outs)

                if _imgsub_mode() == "mul":
                    adds = image_dsv_sub(
                        (meta_ref[2, t] == 1).astype(dtype)
                    )
                else:
                    adds = jax.lax.cond(
                        meta_ref[2, t] == 1, lambda: image_dsv_sub(None),
                        lambda: tuple(
                            jnp.zeros((sub, v_pad), dtype) for _ in dss
                        ),
                    )
                dsvs = [_prefix_add(dsv, a) for dsv, a in zip(dsvs, adds)]
            else:
                def image_dsv(dsvs):
                    ids2d = _image_ids_2d(i_pos, j_pos, geo)
                    imf = ((i_pos < img_len) & (j_pos < img_len)).astype(dtype)
                    ds_is = [ds * imf for ds in dss]
                    out = list(dsvs)
                    for vid in range(nvid):
                        mf = (ids2d == vid).astype(dtype)
                        for hh, ds_i in enumerate(ds_is):
                            out[hh] = out[hh] + col(
                                vid, jnp.sum(ds_i * mf, axis=1)
                            )
                    return tuple(out)

                dsvs = jax.lax.cond(
                    meta_ref[2, t] == 1, image_dsv, lambda x: tuple(x),
                    tuple(dsvs),
                )

            if geo.text_part_id < rel_vocab:
                mf = ((i_pos < img_len) & (j_pos >= img_len)).astype(dtype)
                dsvs = tuple(
                    dsv + col(geo.text_part_id, jnp.sum(ds * mf, axis=1))
                    for dsv, ds in zip(dsvs, dss)
                )
            if geo.image_part_id < rel_vocab:
                mf = ((i_pos >= img_len) & (j_pos < img_len)).astype(dtype)
                dsvs = tuple(
                    dsv + col(geo.image_part_id, jnp.sum(ds * mf, axis=1))
                    for dsv, ds in zip(dsvs, dss)
                )
        return tuple(dsvs)

    if uncond:
        return general_dsv()
    return jax.lax.cond(meta_ref[3, t] == 2, general_dsv, far_dsv)


def _dropout_keep(seed, head, i_pos, j_pos, rate: float):
    """Deterministic attention-dropout keep factor in {0, 1/(1-rate)}.

    A 3-round multiply-xorshift hash of (seed, head, global query
    position, global key position), int32 wrap-around arithmetic only
    (no PRNG primitive: portable across Mosaic/interpret/host, and the
    backward regenerates the identical mask from the same inputs; global
    positions make the mask consistent across sequence-sharded chunks).
    Pure jnp -- tests call it outside the kernel to build an exact dense
    reference mask.
    """
    x = i_pos * np.int32(-1640531527)            # 0x9E3779B9
    x = x ^ (j_pos * np.int32(-2048144789))      # 0x85EBCA6B
    x = x ^ (seed + head * np.int32(668265261))  # 0x27D4EB2D
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * np.int32(0x45D9F3B)
    x = x ^ jax.lax.shift_right_logical(x, 15)
    x = x * np.int32(0x2C1B3C6D)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    u = jnp.bitwise_and(x, np.int32(0xFFFFFF))   # uniform in [0, 2^24)
    thr = np.int32(round(rate * (1 << 24)))
    return (u >= thr).astype(jnp.float32) * np.float32(1.0 / (1.0 - rate))


def _dropout_tile(seed, batch_idx, head, q_base, k_base, shape, rate: float):
    """Keep-factor tile for a (q_base, k_base) block of one example."""
    i_pos = q_base + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    j_pos = k_base + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    seed_b = seed + batch_idx * np.int32(-1771729351)  # example-distinct
    return _dropout_keep(seed_b, head, i_pos, j_pos, rate)


def _stats_lanes() -> int:
    """Lane width of the m/l flash-statistics scratch: 1 (the default --
    measured v5e B=8/S=4096 fwd 13.1 -> 12.0 ms/layer on top of
    narrow+uncond; the [bq, 1] stores skip the lane broadcast) or 128
    (layout-friendly broadcast rows, ``MMT_ATTN_SLIM_STATS=0``)."""
    return 1 if os.environ.get("MMT_ATTN_SLIM_STATS", "1") == "1" else 128


def _prescale_on(softmax_scale: float) -> bool:
    """Pre-scale the [bq, d] q tile instead of multiplying every [bq, bk]
    score tile by softmax_scale (a full VPU pass per head per grid step).

    Both the QK logits and the qr-derived bias inherit the scale through
    the contractions.  Only engaged for power-of-two scales (the flagship
    1/sqrt(64) = 1/8): a pow2 multiply is an exponent shift, exact in any
    float dtype and distributing exactly over the dot-product sums, so
    the results are bit-identical; a non-pow2 scale would round q in bf16
    before the dot and shift logits by ~0.4%."""
    return (
        os.environ.get("MMT_ATTN_PRESCALE", "1") != "0"
        and math.frexp(softmax_scale)[0] == 0.5
    )


def _apply_length_mask(ss, length, q_base, k_base, block_q, block_k):
    """Add the pad-mask term to every head's score tile.

    Default adds unconditionally: the term is exactly 0.0 on untriggered
    tiles, so this is bit-identical to the guarded form, and Mosaic's
    ``lax.cond`` costs hb x [bq, bk] operand/result copies per grid step
    that dwarf the hb add passes (measured v5e B=8/S=4096 fwd: cond 17.2
    vs uncond 14.2 ms/layer -- the single largest line-item win).
    ``MMT_ATTN_LENMASK=cond`` restores the guarded form."""

    def apply_mask(ss):
        term = _length_mask_term(
            length, q_base, k_base, ss[0].shape, block_q, block_k
        )
        return tuple(s + term for s in ss)

    if os.environ.get("MMT_ATTN_LENMASK", "uncond") == "uncond":
        return apply_mask(tuple(ss))
    tile_end = jnp.maximum(q_base + block_q, k_base + block_k)
    return jax.lax.cond(
        length < tile_end, apply_mask, lambda ss: tuple(ss), tuple(ss)
    )


def _apply_window_mask(ss, geo, q_base, k_base):
    """Sliding-window + prefix-global pattern mask (``RelGeometry.window``).

    Statically a no-op when the pattern is off.  Like the length mask,
    the term is added unconditionally: it is exactly 0.0 on allowed
    pairs, and boundary tiles (partially in-window) are the only ones
    where it bites -- fully-outside tiles never run (see
    ``_window_tile_contributes``)."""
    if geo is None or geo.window <= 0:
        return ss
    shape = ss[0].shape
    i_pos = q_base + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    j_pos = k_base + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    allowed = (
        (i_pos < geo.num_global)
        | (j_pos < geo.num_global)
        | (jnp.abs(j_pos - i_pos) <= geo.window)
    )
    term = jnp.where(allowed, 0.0, NEG_INF)
    return [s + term for s in ss]


def _window_tile_contributes(geo, q_base, k_base, block_q, block_k):
    """Exact tile skip for the sliding-window + prefix-global pattern.

    A tile is dead iff no query row is global (q_base >= num_global), no
    key column is global (k_base >= num_global), and the closest (i, j)
    pair in the tile is farther than ``window`` apart.  Dead tiles'
    softmax weights would be exactly 0.0 under the mask term, so
    skipping them is bit-exact (same argument as the pad-tile skip)."""
    min_dist = jnp.maximum(
        k_base - (q_base + block_q - 1), q_base - (k_base + block_k - 1)
    )
    return (
        (q_base < geo.num_global)
        | (k_base < geo.num_global)
        | (min_dist <= geo.window)
    )


def _tile_run(geo, q_base, k_base, length, block_q, block_k):
    """Combined data-dependent tile predicate: pad skip + window skip."""
    run = _tile_contributes(q_base, k_base, length, block_q, block_k)
    if geo is not None and geo.window > 0:
        run = run & _window_tile_contributes(geo, q_base, k_base, block_q,
                                             block_k)
    return run


def _tile_contributes(q_base, k_base, length, block_q, block_k):
    """Exact tile skip: only tiles with real queries AND real keys run.

    Cross-boundary (real x pad) pairs get -1e4 on every logit, so their
    softmax weight underflows to exactly 0.0 in float32 -- skipping those
    tiles changes nothing.  Pad x pad tiles (the reference's segmented
    mask lets padding attend padding) are skipped too: every consumer in
    the framework (CLS pooling, MLM/MPP gathers, losses, metrics) reads
    only real positions, so pad-row outputs -- zeros here instead of the
    reference's softmax-over-padding garbage -- are exactly unused and
    their true gradients are exactly zero.  This makes attention cost
    scale with the real length, not the padded S (a fully-padded row
    emits o = 0 / lse = -inf; combiners and the backward clamp -inf).
    """
    return (q_base < length) & (k_base < length)


def _length_mask_term(length, q_base, k_base, shape, block_q, block_k):
    q_pos = q_base + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    k_pos = k_base + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    same = (q_pos < length) == (k_pos < length)
    return jnp.where(same, 0.0, NEG_INF)


# ================================================================ forward


def _split_tile_lists(meta: np.ndarray, nq: int, nk: int):
    """Static far/structured tile lists for the split forward.

    Returns two int32 arrays [T+1, 3] of (qi, ki, flag) rows sorted by
    qi: ``far`` holds kind-0/1 tiles (flag 0 = right clip, 1 = left
    clip) and ``struct`` holds kind-2 tiles.  BOTH lists get a flag-2
    sentinel row for any qi with no tiles of their kind, so every
    output block is initialized and finalized (a qi row that is all-far
    -- possible in 1D text-only geometry -- would otherwise leave the
    structured pass's o/lse blocks unwritten and feed garbage into the
    logsumexp combine).  The extra guard row (-1, 0, 2) lets the kernel
    read tmeta[t + 1] unconditionally."""
    far, struct = [], []
    kind = meta[3]
    for qi in range(nq):
        row_far = [
            (qi, ki, int(kind[qi * nk + ki] == 1))
            for ki in range(nk) if kind[qi * nk + ki] != 2
        ]
        far.extend(row_far if row_far else [(qi, 0, 2)])
        row_struct = [
            (qi, ki, 0) for ki in range(nk) if kind[qi * nk + ki] == 2
        ]
        struct.extend(row_struct if row_struct else [(qi, 0, 2)])
    guard = (-1, 0, 2)
    return (np.asarray(far + [guard], np.int32).T.copy(),
            np.asarray(struct + [guard], np.int32).T.copy())


@functools.lru_cache(maxsize=None)
def _window_tile_list(geo: RelGeometry, seq_len: int, block_q: int,
                      block_k: int, sort: str = "q") -> np.ndarray:
    """Static live-tile list for the sliding-window + prefix-global
    pattern: (qi, ki, 0) rows, one guard row (-1, -1, 2).

    ``sort='q'`` orders by qi (forward / dq passes, scratch accumulates
    over a qi run); ``sort='k'`` orders by ki (dkv pass).  Every qi owns
    its diagonal tile and every ki is reached by its diagonal query, so
    every output block is visited (no per-row sentinels needed).
    Driving the grid off this list means dead tiles never occupy a
    fetch/pipeline slot -- the pl.when skip on the rectangular grid
    saves their compute but not their slot, which capped the windowed
    kernel at ~72% of dense cost when only ~50% of tiles are live (and
    far less at 8k/16k).

    Measured on v5e (round 4; B=8, window 512, g=198, ms/layer,
    two-pass backward): fwd list/rect 8.03/9.67 at 4k (-17%) and
    16.80/22.84 at 8k (-26%); fwd+bwd 22.48/24.69 and 43.57/60.24.
    List is the default; ``MMT_ATTN_WINDOW_GRID=rect`` reverts."""
    nq, nk = seq_len // block_q, seq_len // block_k
    rows = []
    for qi in range(nq):
        q_base = qi * block_q
        for ki in range(nk):
            k_base = ki * block_k
            min_dist = max(k_base - (q_base + block_q - 1),
                           q_base - (k_base + block_k - 1))
            if (q_base < geo.num_global or k_base < geo.num_global
                    or min_dist <= geo.window):
                rows.append((qi, ki, 0))
    if sort == "k":
        rows.sort(key=lambda r: (r[1], r[0]))
    rows.append((-1, -1, 2))
    out = np.asarray(rows, np.int32).T.copy()
    out.setflags(write=False)
    return out


def _fwd_list_kernel(
    lengths_ref, qoff_ref, meta_ref, tmeta_ref, q_ref, k_ref, v_ref, rel_ref,
    *rest, geo, rel_vocab, block_q, block_k, nk, hb, softmax_scale, far,
    dropout_rate=0.0, imgfetch=False,
):
    """List-driven forward over a static tile subset (split schedule).

    The grid's last dimension walks a (qi, ki, flag) table sorted by qi;
    scratch init/finalize trigger on qi changes.  ``far=True`` bodies
    add the single clip bias through the flash row statistics (m_cur
    and the exp offset are [bq] vectors) -- zero per-element bias work,
    exactly the norel inner loop.  ``far=False`` runs the full bias
    chain of ``_fwd_kernel``.  Outputs are float32 partials combined by
    the caller via logsumexp; rows whose tiles were all skipped emit
    lse = -inf / o = 0 so the combine ignores them."""
    if imgfetch:
        img_ref, o_ref, lse_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        img_ref = None
        o_ref, lse_ref, m_scratch, l_scratch, acc_scratch = rest
    b = pl.program_id(0)
    hgrp = pl.program_id(1)
    t = pl.program_id(2)
    qi = tmeta_ref[0, t]
    ki = tmeta_ref[1, t]
    flag = tmeta_ref[2, t]
    prev_qi = tmeta_ref[0, jnp.maximum(t - 1, 0)]

    @pl.when((t == 0) | (prev_qi != qi))
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q_base = qi * block_q
    k_base = ki * block_k
    length = lengths_ref[b]
    dtd = geo.text_max_distance

    prescale = _prescale_on(softmax_scale)

    @pl.when(_tile_contributes(q_base, k_base, length, block_q, block_k)
             & (flag != 2))
    def _body():
        qs = [q_ref[0, hh] for hh in range(hb)]
        if prescale:
            qs = [q * jnp.asarray(softmax_scale, q.dtype) for q in qs]
        ss = [
            jax.lax.dot_general(
                q, k_ref[0, hh], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for hh, q in enumerate(qs)
        ]
        shape = ss[0].shape
        qrs = [
            jax.lax.dot_general(
                q, rel_ref[hh], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for hh, q in enumerate(qs)
        ]
        if far:
            # [bq] clip-bias row vector, pre-scaled; folded into the
            # flash statistics below instead of the logits tile.
            avs = [
                jnp.where(flag == 0, qr[:, dtd], qr[:, 2 * dtd])
                for qr in qrs
            ]
            if not prescale:
                avs = [av * softmax_scale for av in avs]
                ss = [s * softmax_scale for s in ss]
        else:
            avs = [None] * hb
            biases = _tile_bias_multi(
                qrs, meta_ref, qi * nk + ki, q_base, k_base, shape, geo,
                rel_vocab, block_q, block_k, skip_image=imgfetch,
            )
            if imgfetch:
                # Slot 0 of the fetch buffer is zeros; the index map
                # selects the corner slot only on tile (0, 0).
                biases = [
                    bias + img_ref[0, hh]
                    for hh, bias in enumerate(biases)
                ]
            if prescale:
                ss = [s + bias for s, bias in zip(ss, biases)]
            else:
                ss = [
                    (s + bias) * softmax_scale for s, bias in zip(ss, biases)
                ]

        ss = _apply_length_mask(ss, length, q_base, k_base, block_q, block_k)
        ss = _apply_window_mask(ss, geo, q_base, k_base)

        for hh, s in enumerate(ss):
            m_prev = m_scratch[hh, :, 0]
            l_prev = l_scratch[hh, :, 0]
            m_cur = jnp.max(s, axis=1)
            if far:
                m_cur = m_cur + avs[hh]
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            ofs = m_next - avs[hh] if far else m_next
            p = jnp.exp(s - ofs[:, None])
            l_next = l_prev * alpha + jnp.sum(p, axis=1)

            m_scratch[hh] = jnp.broadcast_to(m_next[:, None], m_scratch.shape[1:])
            l_scratch[hh] = jnp.broadcast_to(l_next[:, None], l_scratch.shape[1:])

            v_tile = v_ref[0, hh]
            if dropout_rate:
                head = hgrp * hb + hh
                keep = _dropout_tile(
                    qoff_ref[2], qoff_ref[3] + b, head, q_base, k_base, p.shape, dropout_rate
                )
                p = p * keep
            pv = jax.lax.dot_general(
                p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scratch[hh] = acc_scratch[hh] * alpha[:, None] + pv

    nxt_qi = tmeta_ref[0, t + 1]

    @pl.when((t == pl.num_programs(2) - 1) | (nxt_qi != qi))
    def _finalize():
        for hh in range(hb):
            l_final = l_scratch[hh, :, 0]
            l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
            o_ref[0, hh] = (acc_scratch[hh] / l_safe[:, None]).astype(o_ref.dtype)
            lse_ref[0, hh, :, 0] = jnp.where(
                l_final == 0.0, -jnp.inf, m_scratch[hh, :, 0] + jnp.log(l_safe)
            ).astype(jnp.float32)


def _run_fwd_list(qt, kt, vt, rel_h, lengths, qoff, meta, tlist, geometry,
                  rel_vocab, block_q, block_k, nk, hb, interpret, *,
                  far, dropout_rate=0.0, img_buf=None):
    """One list-driven forward pass over a static (qi, ki, flag) table.

    Shared by the far/structured split schedule and the sliding-window
    list grid.  Outputs float32 o partials + lse; rows with no live
    tiles emit lse = -inf / o = 0.  ``img_buf`` (far=False only): the
    two-slot image-corner fetch buffer (``MMT_ATTN_IMG=fetch``)."""
    batch, num_heads, seq_len, head_dim = qt.shape
    scale = 1.0 / (head_dim**0.5)
    imgfetch = img_buf is not None and not far

    def im_q(b, h, t, lens, qoff_, meta_, tm):
        return (b, h, tm[0, t], 0)

    def im_k(b, h, t, lens, qoff_, meta_, tm):
        return (b, h, tm[1, t], 0)

    kernel = functools.partial(
        _fwd_list_kernel, geo=geometry, rel_vocab=rel_vocab,
        block_q=block_q, block_k=block_k, nk=nk, hb=hb,
        softmax_scale=scale, far=far, dropout_rate=dropout_rate,
        imgfetch=imgfetch,
    )
    in_specs = [
        pl.BlockSpec((1, hb, block_q, head_dim), im_q,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, block_k, head_dim), im_k,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, block_k, head_dim), im_k,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hb, rel_h.shape[1], head_dim),
                     lambda b, h, t, *_: (h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    extra_args = []
    if imgfetch:
        hg_n = num_heads // hb
        in_specs.append(
            pl.BlockSpec(
                (1, hb, block_q, block_k),
                lambda b, h, t, lens, qoff_, meta_, tm: (
                    jnp.where((tm[0, t] == 0) & (tm[1, t] == 0),
                              1 + b * hg_n + h, 0),
                    0, 0, 0,
                ),
                memory_space=pltpu.VMEM,
            )
        )
        extra_args.append(img_buf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(batch, num_heads // hb, tlist.shape[1] - 1),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, hb, block_q, head_dim), im_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, block_q, 1),
                         lambda b, h, t, lens, qoff_, meta_, tm:
                             (b, h, tm[0, t], 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((hb, block_q, _stats_lanes()), jnp.float32),
            pltpu.VMEM((hb, block_q, _stats_lanes()), jnp.float32),
            pltpu.VMEM((hb, block_q, head_dim), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, jnp.float32),
            jax.ShapeDtypeStruct((batch, num_heads, seq_len, 1),
                                 jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qoff, jnp.asarray(meta),
      jnp.asarray(tlist), qt, kt, vt, rel_h, *extra_args)


def _forward_split(q, k, v, lengths, qoff, rel_h, meta, geometry, rel_vocab,
                   block_q, block_k, nq, nk, hb, interpret, dropout_rate=0.0,
                   far_mode="rect"):
    """Split schedule: far pass + structured list pass + logsumexp combine.

    far_mode 'rect' (default) runs the far tiles on the RECTANGULAR
    grid with an in-kernel kind-skip -- the list-driven grid costs a
    measured ~20% more per tile, and far tiles are the majority
    (48% at 4k, 77%+ at 8k), so they ride the cheap grid while only the
    structured minority pays the list overhead.  'list' is the legacy
    two-list schedule (kept for A/B measurement)."""
    batch, seq_len, num_heads, head_dim = q.shape
    far_list, struct_list = _split_tile_lists(np.asarray(meta), nq, nk)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    scale = 1.0 / (head_dim**0.5)

    def run_rect_far():
        kernel = functools.partial(
            _fwd_kernel, geo=geometry, rel_vocab=rel_vocab,
            block_q=block_q, block_k=block_k, nk=nk, hb=hb,
            softmax_scale=scale, dropout_rate=dropout_rate, far_only=True,
        )
        in_specs = [
            pl.BlockSpec((1, hb, block_q, head_dim), _im_q,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, block_k, head_dim), _im_k,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, block_k, head_dim), _im_k,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, rel_h.shape[1], head_dim),
                         lambda b, h, qi, ki, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_heads // hb, nq, nk),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, hb, block_q, head_dim), _im_q,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, block_q, 1),
                             lambda b, h, qi, ki, *_: (b, h, qi, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((hb, block_q, _stats_lanes()), jnp.float32),
                pltpu.VMEM((hb, block_q, _stats_lanes()), jnp.float32),
                pltpu.VMEM((hb, block_q, head_dim), jnp.float32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(qt.shape, jnp.float32),
                jax.ShapeDtypeStruct((batch, num_heads, seq_len, 1),
                                     jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(lengths.astype(jnp.int32), qoff, jnp.asarray(meta), qt, kt, vt,
          rel_h)

    if far_mode == "rect":
        o_f, lse_f = run_rect_far()
    else:
        o_f, lse_f = _run_fwd_list(
            qt, kt, vt, rel_h, lengths, qoff, meta, far_list, geometry,
            rel_vocab, block_q, block_k, nk, hb, interpret,
            far=True, dropout_rate=dropout_rate)
    img_buf = None
    if _imgfetch_applicable(geometry, rel_vocab, True, nq, nk):
        img_buf = _build_img_corner(
            qt, rel_h, geometry, rel_vocab, block_q, block_k, hb, scale,
        )
    o_s, lse_s = _run_fwd_list(
        qt, kt, vt, rel_h, lengths, qoff, meta, struct_list, geometry,
        rel_vocab, block_q, block_k, nk, hb, interpret,
        far=False, dropout_rate=dropout_rate, img_buf=img_buf)
    lse = jnp.logaddexp(lse_f, lse_s)
    # Fully-padded rows have zero live tiles in BOTH passes: clamp the
    # denominator so exp(-inf - -inf) = NaN never forms (weights 0).
    lse_c = jnp.maximum(lse, jnp.float32(-3e38))
    out = o_f * jnp.exp(lse_f - lse_c) + o_s * jnp.exp(lse_s - lse_c)
    return out.astype(q.dtype).transpose(0, 2, 1, 3), lse


def _fwd_kernel(
    lengths_ref, qoff_ref, meta_ref, q_ref, k_ref, v_ref, *rest,
    geo, rel_vocab, block_q, block_k, nk, hb, softmax_scale,
    dropout_rate=0.0, far_only=False, hbm=False, imgfetch=False,
):
    bias_ref = img_ref = None
    if rel_vocab and hbm:
        rel_ref, bias_ref, o_ref, lse_ref, m_scratch, l_scratch, \
            acc_scratch = rest
    elif rel_vocab and imgfetch:
        rel_ref, img_ref, o_ref, lse_ref, m_scratch, l_scratch, \
            acc_scratch = rest
    elif rel_vocab:
        rel_ref, o_ref, lse_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        rel_ref = None
        o_ref, lse_ref, m_scratch, l_scratch, acc_scratch = rest

    b = pl.program_id(0)
    hgrp = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    t = qi * nk + ki

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q_base = qoff_ref[0] + qi * block_q
    k_base = qoff_ref[1] + ki * block_k
    length = lengths_ref[b]

    run = _tile_run(geo, q_base, k_base, length, block_q, block_k)
    if far_only:
        # Rect-grid far pass of the split schedule: only the far
        # all-text tiles run here (the structured tiles are handled by
        # the list-driven pass and the partials combined by logsumexp).
        # Their single clip bias rides the flash row statistics as a
        # [bq] vector -- zero per-element bias work, no list-grid
        # overhead (measured ~20%/tile) on the majority tile class.
        run = run & (meta_ref[3, t] != 2)

    prescale = _prescale_on(softmax_scale)

    @pl.when(run)
    def _body():
        qs = [q_ref[0, hh] for hh in range(hb)]
        if prescale:
            qs = [q * jnp.asarray(softmax_scale, q.dtype) for q in qs]
        ss = [
            jax.lax.dot_general(
                q, k_ref[0, hh], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for hh, q in enumerate(qs)
        ]
        shape = ss[0].shape

        avs = [None] * hb
        if rel_vocab:
            qrs = [
                jax.lax.dot_general(
                    q, rel_ref[hh], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for hh, q in enumerate(qs)
            ]
            dtd = geo.text_max_distance
            if far_only:
                avs = [
                    jnp.where(meta_ref[3, t] == 0, qr[:, dtd], qr[:, 2 * dtd])
                    for qr in qrs
                ]
                if not prescale:
                    avs = [av * softmax_scale for av in avs]
            elif hbm:
                # Precomputed-slot mode: structured tiles (|ki-qi| <= 1
                # or ki == 0) add the fetched full-bias tile; every other
                # tile's bias is row-constant (all its keys are text, so
                # per row it is the far clip -- or the part value on the
                # q-block-0 image rows) and rides the flash statistics.
                # The flag multiply zeroes whichever term does not apply,
                # keeping one unconditional code path (Mosaic conds copy
                # their operands every step).
                flagf = (
                    (jnp.abs(ki - qi) <= 1) | (ki == 0)
                ).astype(jnp.float32)
                keepf = 1.0 - flagf
                img_len = geo.image_len
                text_row = None
                if img_len:
                    i_pos = q_base + jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, 1), 0
                    )[:, 0]
                    text_row = i_pos >= img_len
                for hh, qr in enumerate(qrs):
                    fetched = bias_ref[0, 0, 0, 0, hh]
                    ss[hh] = ss[hh] + fetched.astype(jnp.float32) * flagf
                    av = jnp.where(ki > qi, qr[:, dtd], qr[:, 2 * dtd])
                    if text_row is not None:
                        pv = (
                            qr[:, geo.text_part_id]
                            if geo.text_part_id < rel_vocab
                            else jnp.zeros_like(av)
                        )
                        av = jnp.where(text_row, av, pv)
                    if not prescale:
                        av = av * softmax_scale
                    avs[hh] = av * keepf
            else:
                biases = _tile_bias_multi(
                    qrs, meta_ref, t, q_base, k_base, shape, geo, rel_vocab,
                    block_q, block_k, skip_image=imgfetch,
                )
                ss = [s + bias for s, bias in zip(ss, biases)]
                if imgfetch:
                    # Slot 0 of the fetch buffer is zeros; the index map
                    # selects the corner slot only on tile (0, 0), so
                    # this add is exact everywhere and cond-free.
                    ss = [
                        s + img_ref[0, hh] for hh, s in enumerate(ss)
                    ]

        if not prescale:
            ss = [s * softmax_scale for s in ss]

        ss = _apply_length_mask(ss, length, q_base, k_base, block_q, block_k)
        ss = _apply_window_mask(ss, geo, q_base, k_base)

        for hh, s in enumerate(ss):
            m_prev = m_scratch[hh, :, 0]
            l_prev = l_scratch[hh, :, 0]
            m_cur = jnp.max(s, axis=1)
            if avs[hh] is not None:
                m_cur = m_cur + avs[hh]
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            ofs = m_next - avs[hh] if avs[hh] is not None else m_next
            p = jnp.exp(s - ofs[:, None])
            l_next = l_prev * alpha + jnp.sum(p, axis=1)

            m_scratch[hh] = jnp.broadcast_to(m_next[:, None], m_scratch.shape[1:])
            l_scratch[hh] = jnp.broadcast_to(l_next[:, None], l_scratch.shape[1:])

            v_tile = v_ref[0, hh]
            if dropout_rate:
                # Reference order (post-softmax dropout): l keeps the
                # full sum; only the value accumulation sees the mask.
                head = hgrp * hb + hh
                keep = _dropout_tile(
                    qoff_ref[2], qoff_ref[3] + b, head, q_base, k_base, p.shape, dropout_rate
                )
                p = p * keep
            pv = jax.lax.dot_general(
                p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scratch[hh] = acc_scratch[hh] * alpha[:, None] + pv

    @pl.when(ki == pl.num_programs(3) - 1)
    def _finalize():
        for hh in range(hb):
            l_final = l_scratch[hh, :, 0]
            # A row can end with l == 0 when *every* k-tile of this call
            # was skipped (sequence-sharded chunk fully on the other side
            # of the length boundary): emit 0 output and -inf lse so the
            # cross-chunk logsumexp combine ignores this shard, instead
            # of 0/0 = NaN.
            l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
            o_ref[0, hh] = (acc_scratch[hh] / l_safe[:, None]).astype(o_ref.dtype)
            lse_ref[0, hh, :, 0] = (
                m_scratch[hh, :, 0] + jnp.log(l_safe)
            ).astype(jnp.float32)


def _prepare(q, k, rel_table, geometry, block_q, block_k, q_start=0, k_start=0):
    batch, seq_q, num_heads, head_dim = q.shape
    seq_k = k.shape[1]
    block_q = min(block_q, seq_q)
    block_k = min(block_k, seq_k)
    if seq_q % block_q or seq_k % block_k:
        raise ValueError(f"seq ({seq_q},{seq_k}) not divisible by {block_q}/{block_k}")
    have_rel = rel_table is not None and geometry is not None
    if have_rel and geometry.image_len > min(block_q, block_k):
        raise ValueError(
            f"image block ({geometry.image_len}) must fit in one tile "
            f"({block_q}x{block_k})"
        )
    nq, nk = seq_q // block_q, seq_k // block_k
    if have_rel:
        rel_vocab = rel_table.shape[0]
        # Augment with the text band ids duplicated in vid order at
        # column rel_vocab: qr = q @ rel_h then holds the band strip
        # contiguously (see _band_bias_rolled).  The extra columns ride
        # the v_pad padding, cost nothing in the matmul, and are never
        # touched by the backward scatter (dsv stays in original vids).
        band = rel_table[np.asarray(_band_vid_order(geometry.text_max_distance))]
        aug = jnp.concatenate([rel_table, band], axis=0).astype(q.dtype)
        v_pad = _round_up(aug.shape[0], 128)
        rel_h = jnp.pad(
            aug.transpose(1, 0, 2),
            ((0, 0), (0, v_pad - aug.shape[0]), (0, 0)),
        )  # [H, V_pad, head_dim]
        static_offsets = (
            isinstance(q_start, int) and q_start == 0
            and isinstance(k_start, int) and k_start == 0
        )
        if static_offsets and seq_q == seq_k:
            meta = jnp.asarray(_build_tile_meta(geometry, seq_q, block_q, block_k))
        else:
            meta = _build_tile_meta_traced(
                geometry, seq_q, seq_k, block_q, block_k, q_start, k_start
            )
    else:
        rel_vocab, v_pad, rel_h = 0, 0, None
        meta = jnp.zeros((4, nq * nk), jnp.int32)
    return block_q, block_k, nq, nk, rel_vocab, v_pad, rel_h, meta


def _im_q(b, h, qi, ki, *_):
    return (b, h, qi, 0)


def _im_k(b, h, qi, ki, *_):
    return (b, h, ki, 0)


def _attention_forward(q, k, v, rel_table, geometry, lengths,
                       block_q, block_k, interpret, q_start=0, k_start=0,
                       dropout_rate=0.0, dropout_seed=None, batch_start=0):
    batch, seq_len, num_heads, head_dim = q.shape
    block_q, block_k, nq, nk, rel_vocab, v_pad, rel_h, meta = _prepare(
        q, k, rel_table, geometry, block_q, block_k, q_start, k_start
    )
    # Head packing: several heads per grid step divides the fixed
    # per-step cost (~0.7us on v5e) and shares all head-independent
    # bias-mask work.  hb=4 measured best at BERT-base geometry
    # (MMT_ATTN_HB overrides for experiments).
    hb_pref = int(os.environ.get("MMT_ATTN_HB", "4"))
    hb = next((h for h in (hb_pref, 4, 2) if h > 0 and num_heads % h == 0), 1)

    # Static tile split: when offsets are static (single-chip path) and
    # MOST tiles are far all-text, run the far tiles through a bias-free
    # list kernel (clip bias riding the flash row statistics) and only
    # the structured tiles through the full bias chain; combine with
    # logsumexp.  Measured on v5e at block 512: the list-driven grid
    # costs ~20% more per tile than the rectangular grid, so the split
    # only pays once the far fraction is large -- at S=4096 (48% far)
    # it breaks even (19.9 vs 19.5 ms), at 8k+ (77%+) it wins.
    # MMT_ATTN_SPLIT: "0" never, "1" whenever far tiles exist, default
    # auto (far fraction >= 0.6).
    static_offsets = (
        isinstance(q_start, int) and q_start == 0
        and isinstance(k_start, int) and k_start == 0
    )
    split_env = os.environ.get("MMT_ATTN_SPLIT", "auto")
    # The far/structured split never pays under the sliding-window
    # pattern: the far all-text tiles it optimizes are exactly the ones
    # the window skip removes outright.
    if geometry is not None and geometry.window > 0:
        split_env = "0"
    hbm = _hbm_bias_on(
        geometry, rel_vocab, block_q, block_k, static_offsets,
        seq_len == k.shape[1],
    )
    if hbm:
        # The slot fetch already gives far tiles the zero-per-element
        # stats path the split schedule's far pass provides, in ONE grid.
        split_env = "0"
    if rel_vocab and static_offsets and seq_len == k.shape[1] and split_env != "0":
        meta_np = _build_tile_meta(geometry, seq_len, block_q, block_k)
        n_tiles = meta_np.shape[1]
        n_far = int((meta_np[3] != 2).sum())
        if (n_far >= 4 if split_env == "1" else n_far >= 0.6 * n_tiles):
            qoff3 = jnp.stack([
                jnp.asarray(q_start, jnp.int32),
                jnp.asarray(k_start, jnp.int32),
                jnp.asarray(
                    dropout_seed if dropout_seed is not None else 0, jnp.int32
                ),
                jnp.asarray(batch_start, jnp.int32),
            ])
            return _forward_split(
                q, k, v, lengths, qoff3, rel_h, meta_np, geometry, rel_vocab,
                block_q, block_k, nq, nk, hb, interpret,
                dropout_rate=dropout_rate,
                # Measured on v5e at 4k (48% far): single 17.46 /
                # list-split 17.98 / rect-split 19.61 ms/layer; at 8k
                # (77% far): single 21.37 / list-split 20.87.  The rect
                # far pass loses everywhere: pl.when-skipped tiles still
                # pay their fetch/pipeline slot, while the list grid
                # never visits them.  So: auto-engage at >=60% far
                # (unchanged), list mode by default, rect kept as an
                # experiment flag.
                far_mode=os.environ.get("MMT_ATTN_SPLIT_MODE", "list"),
            )
    # Sliding-window pattern: drive the grid off the static live-tile
    # list so dead tiles never occupy a fetch/pipeline slot (the rect
    # grid's pl.when skip saves compute only).  MMT_ATTN_WINDOW_GRID=
    # rect reverts to the rectangular grid for A/B.
    if (rel_vocab and static_offsets and seq_len == k.shape[1]
            and geometry is not None and geometry.window > 0
            and os.environ.get("MMT_ATTN_WINDOW_GRID", "list") == "list"):
        wlist = _window_tile_list(geometry, seq_len, block_q, block_k, "q")
        qoff = jnp.stack([
            jnp.asarray(q_start, jnp.int32),
            jnp.asarray(k_start, jnp.int32),
            jnp.asarray(
                dropout_seed if dropout_seed is not None else 0, jnp.int32),
            jnp.asarray(batch_start, jnp.int32),
        ])
        qt_w = q.transpose(0, 2, 1, 3)
        img_buf = None
        if _imgfetch_applicable(geometry, rel_vocab, True, nq, nk):
            img_buf = _build_img_corner(
                qt_w, rel_h, geometry, rel_vocab, block_q, block_k, hb,
                1.0 / (q.shape[-1]**0.5),
            )
        o, lse = _run_fwd_list(
            qt_w, k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), rel_h, lengths, qoff,
            _build_tile_meta(geometry, seq_len, block_q, block_k), wlist,
            geometry, rel_vocab, block_q, block_k, nk, hb, interpret,
            far=False, dropout_rate=dropout_rate, img_buf=img_buf)
        return o.astype(q.dtype).transpose(0, 2, 1, 3), lse
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    in_specs = [
        pl.BlockSpec((1, hb, block_q, head_dim), _im_q, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, block_k, head_dim), _im_k, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, block_k, head_dim), _im_k, memory_space=pltpu.VMEM),
    ]
    args = [qt, kt, vt]
    if rel_vocab:
        in_specs.append(
            pl.BlockSpec((hb, v_pad, head_dim), lambda b, h, qi, ki, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(rel_h)
    if hbm:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1, 1, hb, block_q, block_k),
                lambda b, h, qi, ki, *_: (
                    b, h, qi, _hbm_slot_index(qi, ki), 0, 0, 0
                ),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(_build_bias_slots(
            qt, rel_h, geometry, rel_vocab, block_q, block_k, nq, hb,
            1.0 / (head_dim**0.5),
        ))
    imgfetch = (not hbm) and _imgfetch_applicable(
        geometry, rel_vocab, static_offsets, nq, nk
    )
    if imgfetch:
        hg_n = num_heads // hb
        in_specs.append(
            pl.BlockSpec(
                (1, hb, block_q, block_k),
                lambda b, h, qi, ki, *_: (
                    jnp.where((qi == 0) & (ki == 0), 1 + b * hg_n + h, 0),
                    0, 0, 0,
                ),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(_build_img_corner(
            qt, rel_h, geometry, rel_vocab, block_q, block_k, hb,
            1.0 / (head_dim**0.5),
        ))

    kernel = functools.partial(
        _fwd_kernel, geo=geometry if rel_vocab else None, rel_vocab=rel_vocab,
        block_q=block_q, block_k=block_k, nk=nk, hb=hb,
        softmax_scale=1.0 / (head_dim**0.5), dropout_rate=dropout_rate,
        hbm=hbm, imgfetch=imgfetch,
    )
    qoff = jnp.stack([
        jnp.asarray(q_start, jnp.int32),
        jnp.asarray(k_start, jnp.int32),
        jnp.asarray(dropout_seed if dropout_seed is not None else 0, jnp.int32),
        jnp.asarray(batch_start, jnp.int32),
    ])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, num_heads // hb, nq, nk),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, hb, block_q, head_dim), _im_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, block_q, 1), lambda b, h, qi, ki, *_: (b, h, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((hb, block_q, _stats_lanes()), jnp.float32),
            pltpu.VMEM((hb, block_q, _stats_lanes()), jnp.float32),
            pltpu.VMEM((hb, block_q, head_dim), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, q.dtype),
            jax.ShapeDtypeStruct((batch, num_heads, seq_len, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qoff, meta, *args)
    return out.transpose(0, 2, 1, 3), lse


# =============================================================== backward


def _bwd_tile_core(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, rel_ref,
                   meta_ref, t, q_base, k_base, length, b, hgrp, qoff_ref, *,
                   geo, rel_vocab, block_q, block_k, hb, softmax_scale,
                   dropout_rate, img_ref=None):
    """Shared per-tile backward body (one copy for every kernel shell:
    rect/list x dq/dkv/fused -- ADVICE r3 #1).  Rebuilds the masked
    logits, p = exp(s - lse) and ds = p * (dp - delta) for each packed
    head.

    Returns ``(qs, ks, dss, p_vs, dos)``: ``qs`` come pre-scaled when
    the softmax scale is a power of two (so dK sums accumulated from
    them arrive already scaled -- exact, see the finalize paths);
    ``p_vs`` carry the dropout mask (dV must see the dropped
    probabilities).  Unused returns are dead code the compiler drops
    (e.g. ``p_vs`` in a dq-only shell).
    """
    prescale = _prescale_on(softmax_scale)
    qs = [q_ref[0, hh] for hh in range(hb)]
    if prescale:
        qs = [q * jnp.asarray(softmax_scale, q.dtype) for q in qs]
    ks = [k_ref[0, hh] for hh in range(hb)]
    ss = [
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for q, k in zip(qs, ks)
    ]
    if rel_vocab:
        qrs = [
            jax.lax.dot_general(
                q, rel_ref[hh], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for hh, q in enumerate(qs)
        ]
        biases = _tile_bias_multi(
            qrs, meta_ref, t, q_base, k_base, ss[0].shape, geo,
            rel_vocab, block_q, block_k, skip_image=img_ref is not None,
        )
        if img_ref is not None:
            # Corner-fetch recompute (MMT_ATTN_IMG=fetch): slot 0 of the
            # buffer is zeros; the index map selects the corner slot only
            # on tile (0, 0), so the add is exact and cond-free.
            biases = [
                bias + img_ref[0, hh]
                for hh, bias in enumerate(biases)
            ]
        ss = [s + bias for s, bias in zip(ss, biases)]
    if not prescale:
        ss = [s * softmax_scale for s in ss]

    ss = _apply_length_mask(ss, length, q_base, k_base, block_q, block_k)
    ss = _apply_window_mask(ss, geo, q_base, k_base)

    dss, p_vs, dos = [], [], []
    for hh, s in enumerate(ss):
        lse = lse_ref[0, hh, :, 0]  # [bq]
        # Dead rows (no live tiles anywhere: fully-padded queries) carry
        # lse = -inf; clamp so p underflows to 0 instead of
        # exp(s + inf) = inf poisoning the dRel contraction.
        lse = jnp.where(lse < jnp.float32(-1e38), jnp.float32(3e38), lse)
        p = jnp.exp(s - lse[:, None])
        do = do_ref[0, hh].astype(jnp.float32)
        v_tile = v_ref[0, hh].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_v = p
        if dropout_rate:
            # d(dropout): same mask as the forward, regenerated.
            head = hgrp * hb + hh
            keep = _dropout_tile(
                qoff_ref[2], qoff_ref[3] + b, head, q_base, k_base,
                dp.shape, dropout_rate,
            )
            dp = dp * keep
            p_v = p * keep
        delta = delta_ref[0, hh, :, 0]  # [bq]
        ds = p * (dp - delta[:, None])  # [bq, bk]
        dss.append(ds)
        p_vs.append(p_v)
        dos.append(do)
    return qs, ks, dss, p_vs, dos


def _bwd_dq_kernel(
    lengths_ref, qoff_ref, meta_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
    delta_ref, *rest,
    geo, rel_vocab, v_pad, block_q, block_k, nk, hb, softmax_scale,
    dropout_rate=0.0, imgfetch=False,
):
    img_ref = None
    if rel_vocab and imgfetch:
        rel_ref, img_ref, dq_ref, dr_ref, dq_acc, dsv_acc, dr_acc = rest
    elif rel_vocab:
        rel_ref, dq_ref, dr_ref, dq_acc, dsv_acc, dr_acc = rest
    else:
        rel_ref = None
        (dq_ref, dq_acc) = rest

    b = pl.program_id(0)
    hgrp = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    t = qi * nk + ki

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)
        if rel_vocab:
            dsv_acc[...] = jnp.zeros_like(dsv_acc)

    if rel_vocab:
        @pl.when((qi == 0) & (ki == 0))
        def _init_dr():
            dr_acc[...] = jnp.zeros_like(dr_acc)

    q_base = qoff_ref[0] + qi * block_q
    k_base = qoff_ref[1] + ki * block_k
    length = lengths_ref[b]

    prescale = _prescale_on(softmax_scale)

    @pl.when(_tile_run(geo, q_base, k_base, length, block_q, block_k))
    def _body():
        qs, ks, dss, _p_vs, _dos = _bwd_tile_core(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, rel_ref,
            meta_ref, t, q_base, k_base, length, b, hgrp, qoff_ref,
            geo=geo, rel_vocab=rel_vocab, block_q=block_q, block_k=block_k,
            hb=hb, softmax_scale=softmax_scale, dropout_rate=dropout_rate,
            img_ref=img_ref,
        )
        for hh, ds in enumerate(dss):
            dq_acc[hh] = dq_acc[hh] + jax.lax.dot_general(
                ds, ks[hh].astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if rel_vocab:
            dsvs = _tile_dsv_multi(
                dss, meta_ref, t, q_base, k_base, v_pad, geo, rel_vocab,
                block_q, block_k,
            )
            for hh, dsv in enumerate(dsvs):
                dsv_acc[hh] = dsv_acc[hh] + dsv

    @pl.when(ki == pl.num_programs(3) - 1)
    def _finalize():
        for hh in range(hb):
            dq = dq_acc[hh]
            if rel_vocab:
                dq = dq + jax.lax.dot_general(
                    dsv_acc[hh], rel_ref[hh].astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dr_acc[hh] = dr_acc[hh] + jax.lax.dot_general(
                    dsv_acc[hh], q_ref[0, hh].astype(jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * softmax_scale
            dq_ref[0, hh] = (dq * softmax_scale).astype(dq_ref.dtype)
        if rel_vocab:
            @pl.when(qi == pl.num_programs(2) - 1)
            def _write_dr():
                dr_ref[0] = dr_acc[...]


def _bwd_dkv_kernel(
    lengths_ref, qoff_ref, meta_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
    delta_ref, *rest,
    geo, rel_vocab, block_q, block_k, nk, hb, softmax_scale,
    dropout_rate=0.0, imgfetch=False,
):
    img_ref = None
    if rel_vocab and imgfetch:
        rel_ref, img_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    elif rel_vocab:
        rel_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    else:
        rel_ref = None
        dk_ref, dv_ref, dk_acc, dv_acc = rest

    b = pl.program_id(0)
    hgrp = pl.program_id(1)
    ki = pl.program_id(2)  # outer: fixed k tile
    qi = pl.program_id(3)  # inner: q streams
    t = qi * nk + ki

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_base = qoff_ref[0] + qi * block_q
    k_base = qoff_ref[1] + ki * block_k
    length = lengths_ref[b]

    prescale = _prescale_on(softmax_scale)

    @pl.when(_tile_run(geo, q_base, k_base, length, block_q, block_k))
    def _body():
        # The prescaled qs also feed the dK accumulation, so dk_acc
        # arrives already scaled and _finalize skips its multiply (a
        # pow2 scale distributes exactly over the dot sums).
        qs, _ks, dss, p_vs, dos = _bwd_tile_core(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, rel_ref,
            meta_ref, t, q_base, k_base, length, b, hgrp, qoff_ref,
            geo=geo, rel_vocab=rel_vocab, block_q=block_q, block_k=block_k,
            hb=hb, softmax_scale=softmax_scale, dropout_rate=dropout_rate,
            img_ref=img_ref,
        )
        for hh, ds in enumerate(dss):
            dv_acc[hh] = dv_acc[hh] + jax.lax.dot_general(
                p_vs[hh], dos[hh], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_acc[hh] = dk_acc[hh] + jax.lax.dot_general(
                ds, qs[hh].astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(qi == pl.num_programs(3) - 1)
    def _finalize():
        for hh in range(hb):
            if prescale:
                # dk_acc accumulated ds @ (scale * q): already scaled.
                dk_ref[0, hh] = dk_acc[hh].astype(dk_ref.dtype)
            else:
                dk_ref[0, hh] = (
                    dk_acc[hh] * softmax_scale
                ).astype(dk_ref.dtype)
            dv_ref[0, hh] = dv_acc[hh].astype(dv_ref.dtype)


def _bwd_fused_kernel(
    lengths_ref, qoff_ref, meta_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
    delta_ref, *rest,
    geo, rel_vocab, v_pad, block_q, block_k, nk, hb, softmax_scale,
    dropout_rate=0.0, imgfetch=False,
):
    """One-pass backward: dq + dRel + dk + dv from a single tile sweep.

    The split backward (``_bwd_dq_kernel`` + ``_bwd_dkv_kernel``)
    recomputes the logits, the relative-bias select chain, the exp and
    the dp dot twice -- once per pass -- because dq accumulates along
    rows and dk/dv along columns.  Here the grid stays row-major (the
    dq pass's (b, h, qi, ki)) and dk/dv accumulate into a full-K-length
    VMEM scratch ([hb, nk, bk, D] fp32 -- 4 MB at S=4096, 16 MB at 16k)
    that persists across the whole (b, head-group) slice and is written
    out on its last step.  Per-(ki) accumulation still sees qi in
    ascending order, so dk/dv sums are BIT-IDENTICAL to the two-pass
    schedule; dq/dRel are the dq pass unchanged.  What the fusion
    deletes is the entire second pass: its q·k and q·rel MXU dots, its
    bias select chain (the expensive VPU work), its exp/dp/ds, and its
    grid's fetch slots.
    """
    img_ref = None
    if rel_vocab and imgfetch:
        (rel_ref, img_ref, dq_ref, dr_ref, dk_ref, dv_ref,
         dq_acc, dsv_acc, dr_acc, dk_acc, dv_acc) = rest
    elif rel_vocab:
        (rel_ref, dq_ref, dr_ref, dk_ref, dv_ref,
         dq_acc, dsv_acc, dr_acc, dk_acc, dv_acc) = rest
    else:
        rel_ref = None
        dq_ref, dk_ref, dv_ref, dq_acc, dk_acc, dv_acc = rest

    b = pl.program_id(0)
    hgrp = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    t = qi * nk + ki

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)
        if rel_vocab:
            dsv_acc[...] = jnp.zeros_like(dsv_acc)

    @pl.when((qi == 0) & (ki == 0))
    def _init_slice():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)
        if rel_vocab:
            dr_acc[...] = jnp.zeros_like(dr_acc)

    q_base = qoff_ref[0] + qi * block_q
    k_base = qoff_ref[1] + ki * block_k
    length = lengths_ref[b]

    prescale = _prescale_on(softmax_scale)

    @pl.when(_tile_run(geo, q_base, k_base, length, block_q, block_k))
    def _body():
        # Prescaled qs also feed the dK accumulation, so dk arrives
        # already scaled and the write-out skips its multiply (pow2
        # scale distributes exactly over the dot sums).
        qs, ks, dss, p_vs, dos = _bwd_tile_core(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, rel_ref,
            meta_ref, t, q_base, k_base, length, b, hgrp, qoff_ref,
            geo=geo, rel_vocab=rel_vocab, block_q=block_q, block_k=block_k,
            hb=hb, softmax_scale=softmax_scale, dropout_rate=dropout_rate,
            img_ref=img_ref,
        )
        for hh, ds in enumerate(dss):
            dq_acc[hh] = dq_acc[hh] + jax.lax.dot_general(
                ds, ks[hh].astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv_acc[hh, ki] = dv_acc[hh, ki] + jax.lax.dot_general(
                p_vs[hh], dos[hh], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_acc[hh, ki] = dk_acc[hh, ki] + jax.lax.dot_general(
                ds, qs[hh].astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if rel_vocab:
            dsvs = _tile_dsv_multi(
                dss, meta_ref, t, q_base, k_base, v_pad, geo, rel_vocab,
                block_q, block_k,
            )
            for hh, dsv in enumerate(dsvs):
                dsv_acc[hh] = dsv_acc[hh] + dsv

    @pl.when(ki == pl.num_programs(3) - 1)
    def _finalize():
        for hh in range(hb):
            dq = dq_acc[hh]
            if rel_vocab:
                dq = dq + jax.lax.dot_general(
                    dsv_acc[hh], rel_ref[hh].astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dr_acc[hh] = dr_acc[hh] + jax.lax.dot_general(
                    dsv_acc[hh], q_ref[0, hh].astype(jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * softmax_scale
            dq_ref[0, hh] = (dq * softmax_scale).astype(dq_ref.dtype)

    @pl.when((qi == pl.num_programs(2) - 1) & (ki == pl.num_programs(3) - 1))
    def _write_slice():
        for hh in range(hb):
            for kk in range(nk):  # static slices into the full-K block
                sl = slice(kk * block_k, (kk + 1) * block_k)
                if prescale:
                    dk_ref[0, hh, sl] = dk_acc[hh, kk].astype(dk_ref.dtype)
                else:
                    dk_ref[0, hh, sl] = (
                        dk_acc[hh, kk] * softmax_scale
                    ).astype(dk_ref.dtype)
                dv_ref[0, hh, sl] = dv_acc[hh, kk].astype(dv_ref.dtype)
        if rel_vocab:
            dr_ref[0] = dr_acc[...]


def _bwd_dq_list_kernel(
    lengths_ref, qoff_ref, meta_ref, tmeta_ref, q_ref, k_ref, v_ref, do_ref,
    lse_ref, delta_ref, rel_ref, *rest,
    geo, rel_vocab, v_pad, block_q, block_k, nk, hb, softmax_scale,
    dropout_rate=0.0, imgfetch=False,
):
    """List-driven dq (+ dRel) over a static qi-sorted tile subset
    (sliding-window grid).  Same body as ``_bwd_dq_kernel``; scratch
    init/finalize trigger on qi changes, dRel writes on the last step."""
    if imgfetch:
        img_ref, dq_ref, dr_ref, dq_acc, dsv_acc, dr_acc = rest
    else:
        img_ref = None
        dq_ref, dr_ref, dq_acc, dsv_acc, dr_acc = rest
    b = pl.program_id(0)
    hgrp = pl.program_id(1)
    t = pl.program_id(2)
    qi = tmeta_ref[0, t]
    ki = tmeta_ref[1, t]
    flag = tmeta_ref[2, t]
    prev_qi = tmeta_ref[0, jnp.maximum(t - 1, 0)]

    @pl.when((t == 0) | (prev_qi != qi))
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)
        dsv_acc[...] = jnp.zeros_like(dsv_acc)

    @pl.when(t == 0)
    def _init_dr():
        dr_acc[...] = jnp.zeros_like(dr_acc)

    q_base = qoff_ref[0] + qi * block_q
    k_base = qoff_ref[1] + ki * block_k
    length = lengths_ref[b]

    prescale = _prescale_on(softmax_scale)

    @pl.when(_tile_contributes(q_base, k_base, length, block_q, block_k)
             & (flag != 2))
    def _body():
        qs, ks, dss, _p_vs, _dos = _bwd_tile_core(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, rel_ref,
            meta_ref, qi * nk + ki, q_base, k_base, length, b, hgrp,
            qoff_ref, geo=geo, rel_vocab=rel_vocab, block_q=block_q,
            block_k=block_k, hb=hb, softmax_scale=softmax_scale,
            dropout_rate=dropout_rate, img_ref=img_ref,
        )
        for hh, ds in enumerate(dss):
            dq_acc[hh] = dq_acc[hh] + jax.lax.dot_general(
                ds, ks[hh].astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dsvs = _tile_dsv_multi(
            dss, meta_ref, qi * nk + ki, q_base, k_base, v_pad, geo,
            rel_vocab, block_q, block_k,
        )
        for hh, dsv in enumerate(dsvs):
            dsv_acc[hh] = dsv_acc[hh] + dsv

    nxt_qi = tmeta_ref[0, t + 1]

    @pl.when((t == pl.num_programs(2) - 1) | (nxt_qi != qi))
    def _finalize():
        for hh in range(hb):
            dq = dq_acc[hh] + jax.lax.dot_general(
                dsv_acc[hh], rel_ref[hh].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dr_acc[hh] = dr_acc[hh] + jax.lax.dot_general(
                dsv_acc[hh], q_ref[0, hh].astype(jnp.float32),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * softmax_scale
            dq_ref[0, hh] = (dq * softmax_scale).astype(dq_ref.dtype)

        @pl.when(t == pl.num_programs(2) - 1)
        def _write_dr():
            dr_ref[0] = dr_acc[...]


def _bwd_dkv_list_kernel(
    lengths_ref, qoff_ref, meta_ref, tmeta_ref, q_ref, k_ref, v_ref, do_ref,
    lse_ref, delta_ref, rel_ref, *rest,
    geo, rel_vocab, block_q, block_k, nk, hb, softmax_scale,
    dropout_rate=0.0, imgfetch=False,
):
    """List-driven dk/dv over a static ki-sorted tile subset
    (sliding-window grid).  Same body as ``_bwd_dkv_kernel``; scratch
    init/finalize trigger on ki changes."""
    if imgfetch:
        img_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    else:
        img_ref = None
        dk_ref, dv_ref, dk_acc, dv_acc = rest
    b = pl.program_id(0)
    hgrp = pl.program_id(1)
    t = pl.program_id(2)
    qi = tmeta_ref[0, t]
    ki = tmeta_ref[1, t]
    flag = tmeta_ref[2, t]
    prev_ki = tmeta_ref[1, jnp.maximum(t - 1, 0)]

    @pl.when((t == 0) | (prev_ki != ki))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_base = qoff_ref[0] + qi * block_q
    k_base = qoff_ref[1] + ki * block_k
    length = lengths_ref[b]

    prescale = _prescale_on(softmax_scale)

    @pl.when(_tile_contributes(q_base, k_base, length, block_q, block_k)
             & (flag != 2))
    def _body():
        qs, _ks, dss, p_vs, dos = _bwd_tile_core(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, rel_ref,
            meta_ref, qi * nk + ki, q_base, k_base, length, b, hgrp,
            qoff_ref, geo=geo, rel_vocab=rel_vocab, block_q=block_q,
            block_k=block_k, hb=hb, softmax_scale=softmax_scale,
            dropout_rate=dropout_rate, img_ref=img_ref,
        )
        for hh, ds in enumerate(dss):
            dv_acc[hh] = dv_acc[hh] + jax.lax.dot_general(
                p_vs[hh], dos[hh], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_acc[hh] = dk_acc[hh] + jax.lax.dot_general(
                ds, qs[hh].astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    nxt_ki = tmeta_ref[1, t + 1]

    @pl.when((t == pl.num_programs(2) - 1) | (nxt_ki != ki))
    def _finalize():
        for hh in range(hb):
            if prescale:
                dk_ref[0, hh] = dk_acc[hh].astype(dk_ref.dtype)
            else:
                dk_ref[0, hh] = (
                    dk_acc[hh] * softmax_scale
                ).astype(dk_ref.dtype)
            dv_ref[0, hh] = dv_acc[hh].astype(dv_ref.dtype)


def _bwd_fused_list_kernel(
    lengths_ref, qoff_ref, meta_ref, tmeta_ref, q_ref, k_ref, v_ref, do_ref,
    lse_ref, delta_ref, rel_ref, *rest,
    geo, rel_vocab, v_pad, block_q, block_k, nk, hb, softmax_scale,
    dropout_rate=0.0, imgfetch=False,
):
    """One-pass list backward: dq + dRel + dk + dv from a single walk of
    the qi-sorted windowed tile list (see ``_bwd_fused_kernel`` for why
    fusing deletes the second pass).  dk/dv accumulate into a full-K
    VMEM scratch indexed by the tile's ki; the qi-major list visits each
    ki's live tiles in ascending qi order, so the sums are bit-identical
    to the two-pass list schedule."""
    if imgfetch:
        (img_ref, dq_ref, dr_ref, dk_ref, dv_ref,
         dq_acc, dsv_acc, dr_acc, dk_acc, dv_acc) = rest
    else:
        img_ref = None
        (dq_ref, dr_ref, dk_ref, dv_ref,
         dq_acc, dsv_acc, dr_acc, dk_acc, dv_acc) = rest
    b = pl.program_id(0)
    hgrp = pl.program_id(1)
    t = pl.program_id(2)
    qi = tmeta_ref[0, t]
    ki = tmeta_ref[1, t]
    flag = tmeta_ref[2, t]
    prev_qi = tmeta_ref[0, jnp.maximum(t - 1, 0)]

    @pl.when((t == 0) | (prev_qi != qi))
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)
        dsv_acc[...] = jnp.zeros_like(dsv_acc)

    @pl.when(t == 0)
    def _init_slice():
        dr_acc[...] = jnp.zeros_like(dr_acc)
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_base = qoff_ref[0] + qi * block_q
    k_base = qoff_ref[1] + ki * block_k
    length = lengths_ref[b]

    prescale = _prescale_on(softmax_scale)

    @pl.when(_tile_contributes(q_base, k_base, length, block_q, block_k)
             & (flag != 2))
    def _body():
        qs, ks, dss, p_vs, dos = _bwd_tile_core(
            q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, rel_ref,
            meta_ref, qi * nk + ki, q_base, k_base, length, b, hgrp,
            qoff_ref, geo=geo, rel_vocab=rel_vocab, block_q=block_q,
            block_k=block_k, hb=hb, softmax_scale=softmax_scale,
            dropout_rate=dropout_rate, img_ref=img_ref,
        )
        for hh, ds in enumerate(dss):
            dq_acc[hh] = dq_acc[hh] + jax.lax.dot_general(
                ds, ks[hh].astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv_acc[hh, ki] = dv_acc[hh, ki] + jax.lax.dot_general(
                p_vs[hh], dos[hh], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_acc[hh, ki] = dk_acc[hh, ki] + jax.lax.dot_general(
                ds, qs[hh].astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dsvs = _tile_dsv_multi(
            dss, meta_ref, qi * nk + ki, q_base, k_base, v_pad, geo,
            rel_vocab, block_q, block_k,
        )
        for hh, dsv in enumerate(dsvs):
            dsv_acc[hh] = dsv_acc[hh] + dsv

    nxt_qi = tmeta_ref[0, t + 1]

    @pl.when((t == pl.num_programs(2) - 1) | (nxt_qi != qi))
    def _finalize():
        for hh in range(hb):
            dq = dq_acc[hh] + jax.lax.dot_general(
                dsv_acc[hh], rel_ref[hh].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dr_acc[hh] = dr_acc[hh] + jax.lax.dot_general(
                dsv_acc[hh], q_ref[0, hh].astype(jnp.float32),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * softmax_scale
            dq_ref[0, hh] = (dq * softmax_scale).astype(dq_ref.dtype)

    @pl.when(t == pl.num_programs(2) - 1)
    def _write_slice():
        for hh in range(hb):
            for kk in range(nk):  # static slices into the full-K block
                sl = slice(kk * block_k, (kk + 1) * block_k)
                if prescale:
                    dk_ref[0, hh, sl] = dk_acc[hh, kk].astype(dk_ref.dtype)
                else:
                    dk_ref[0, hh, sl] = (
                        dk_acc[hh, kk] * softmax_scale
                    ).astype(dk_ref.dtype)
                dv_ref[0, hh, sl] = dv_acc[hh, kk].astype(dv_ref.dtype)
        dr_ref[0] = dr_acc[...]


def _backward_window_list(qt, kt, vt, dot, lse, delta, rel_h, lengths_i, qoff,
                          meta, geometry, rel_vocab, v_pad, block_q, block_k,
                          nk, hb, interpret, dropout_rate, q_dtype, k_dtype,
                          v_dtype, seq_len, img_buf=None):
    """Both backward passes on the static windowed live-tile lists."""
    batch, num_heads = qt.shape[0], qt.shape[1]
    head_dim = qt.shape[3]
    scale = 1.0 / (head_dim**0.5)
    qlist = _window_tile_list(geometry, seq_len, block_q, block_k, "q")
    klist = _window_tile_list(geometry, seq_len, block_q, block_k, "k")
    imgfetch = img_buf is not None
    hg_n = num_heads // hb
    img_spec = pl.BlockSpec(
        (1, hb, block_q, block_k),
        lambda b, h, t, lens, qoff_, meta_, tm: (
            jnp.where((tm[0, t] == 0) & (tm[1, t] == 0),
                      1 + b * hg_n + h, 0),
            0, 0, 0,
        ),
        memory_space=pltpu.VMEM,
    )
    img_extra = [img_buf] if imgfetch else []
    img_specs = [img_spec] if imgfetch else []

    def im_tq(b, h, t, lens, qoff_, meta_, tm):
        return (b, h, tm[0, t], 0)

    def im_tk(b, h, t, lens, qoff_, meta_, tm):
        return (b, h, tm[1, t], 0)

    rel_spec = pl.BlockSpec((hb, v_pad, head_dim),
                            lambda b, h, t, *_: (h, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_q = pl.BlockSpec((1, hb, block_q, head_dim), im_tq,
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, hb, block_k, head_dim), im_tk,
                          memory_space=pltpu.VMEM)
    vec_q = pl.BlockSpec((1, hb, block_q, 1),
                         lambda b, h, t, lens, qoff_, meta_, tm:
                             (b, h, tm[0, t], 0),
                         memory_space=pltpu.VMEM)

    if os.environ.get("MMT_ATTN_BWD", "fused") == "fused":
        # One-pass fused list backward: the ki-sorted second walk (and
        # its logits + bias-chain recompute) disappears entirely.
        seq_k = kt.shape[2]
        head_dim_k = kt.shape[3]
        kv_full_spec = pl.BlockSpec(
            (1, hb, seq_k, head_dim_k), lambda b, h, t, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _bwd_fused_list_kernel, geo=geometry, rel_vocab=rel_vocab,
            v_pad=v_pad, block_q=block_q, block_k=block_k, nk=nk, hb=hb,
            softmax_scale=scale, dropout_rate=dropout_rate,
            imgfetch=imgfetch,
        )
        dq_t, dr_bh, dk_t, dv_t = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(batch, num_heads // hb, qlist.shape[1] - 1),
                in_specs=[spec_q, spec_k, spec_k, spec_q, vec_q, vec_q,
                          rel_spec] + img_specs,
                out_specs=(
                    spec_q,
                    pl.BlockSpec((1, hb, v_pad, head_dim),
                                 lambda b, h, t, *_: (b, h, 0, 0),
                                 memory_space=pltpu.VMEM),
                    kv_full_spec,
                    kv_full_spec,
                ),
                scratch_shapes=[
                    pltpu.VMEM((hb, block_q, head_dim), jnp.float32),
                    pltpu.VMEM((hb, block_q, v_pad), jnp.float32),
                    pltpu.VMEM((hb, v_pad, head_dim), jnp.float32),
                    pltpu.VMEM((hb, nk, block_k, head_dim_k), jnp.float32),
                    pltpu.VMEM((hb, nk, block_k, head_dim_k), jnp.float32),
                ],
            ),
            out_shape=(
                jax.ShapeDtypeStruct(qt.shape, q_dtype),
                jax.ShapeDtypeStruct((batch, num_heads, v_pad, head_dim),
                                     jnp.float32),
                jax.ShapeDtypeStruct(kt.shape, k_dtype),
                jax.ShapeDtypeStruct(vt.shape, v_dtype),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(lengths_i, qoff, jnp.asarray(meta), jnp.asarray(qlist),
          qt, kt, vt, dot, lse, delta, rel_h, *img_extra)
        return dq_t, dr_bh, dk_t, dv_t

    kernel = functools.partial(
        _bwd_dq_list_kernel, geo=geometry, rel_vocab=rel_vocab, v_pad=v_pad,
        block_q=block_q, block_k=block_k, nk=nk, hb=hb, softmax_scale=scale,
        dropout_rate=dropout_rate, imgfetch=imgfetch,
    )
    dq_t, dr_bh = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(batch, num_heads // hb, qlist.shape[1] - 1),
            in_specs=[spec_q, spec_k, spec_k, spec_q, vec_q, vec_q,
                      rel_spec] + img_specs,
            out_specs=(
                spec_q,
                pl.BlockSpec((1, hb, v_pad, head_dim),
                             lambda b, h, t, *_: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((hb, block_q, head_dim), jnp.float32),
                pltpu.VMEM((hb, block_q, v_pad), jnp.float32),
                pltpu.VMEM((hb, v_pad, head_dim), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, q_dtype),
            jax.ShapeDtypeStruct((batch, num_heads, v_pad, head_dim),
                                 jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths_i, qoff, jnp.asarray(meta), jnp.asarray(qlist),
      qt, kt, vt, dot, lse, delta, rel_h, *img_extra)

    kernel2 = functools.partial(
        _bwd_dkv_list_kernel, geo=geometry, rel_vocab=rel_vocab,
        block_q=block_q, block_k=block_k, nk=nk, hb=hb, softmax_scale=scale,
        dropout_rate=dropout_rate, imgfetch=imgfetch,
    )
    dk_t, dv_t = pl.pallas_call(
        kernel2,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(batch, num_heads // hb, klist.shape[1] - 1),
            in_specs=[spec_q, spec_k, spec_k, spec_q, vec_q, vec_q,
                      rel_spec] + img_specs,
            out_specs=(spec_k, spec_k),
            scratch_shapes=[
                pltpu.VMEM((hb, block_k, head_dim), jnp.float32),
                pltpu.VMEM((hb, block_k, head_dim), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(kt.shape, k_dtype),
            jax.ShapeDtypeStruct(vt.shape, v_dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths_i, qoff, jnp.asarray(meta), jnp.asarray(klist),
      qt, kt, vt, dot, lse, delta, rel_h, *img_extra)
    return dq_t, dr_bh, dk_t, dv_t


def _backward_head_packing(num_heads, seq_k, head_dim, kv_itemsize=2):
    """Heads per backward grid step (hb), with the fused-scratch VMEM cap.

    Under the round-2 cond-heavy schedules hb=1 measured best (packed
    heads blew up VMEM/register pressure under the ds/dsv accumulators
    and cond closures: fwd+bwd 74 ms at hb=4 vs 60 at hb=1).  After the
    round-3 cond-free/MXU-dsv rewrites the pressure dropped and hb=2
    wins (31.7 vs 32.7 ms/layer at B=8/S=4096; hb=4 regressed).

    The fused one-pass backward additionally keeps a full-K VMEM
    footprint that scales with hb * seq_k: the fp32 dk/dv accumulator
    scratch (2 * hb * seq_k * D * 4 bytes) PLUS the dk/dv output
    windows, whose constant-over-(qi, ki) index maps pin them in VMEM
    for the whole (batch, head-group) slice (2 * hb * seq_k * D *
    kv_itemsize bytes).  Measured (window 512, B=8, all-grads): at
    S=16384 hb=2 (25.2 MB resident) craters to 206 ms/layer -- the
    residency starves the pipeline's double buffering -- while hb=1
    (12.6 MB) runs 103 vs the split schedule's 137.  At S<=8192
    (<=12.6 MB) hb=2 wins (47.5 vs 64.8 split at 8k).  So cap the
    residency at ~17 MB (between the measured-good 12.6 and
    measured-bad 25.2) by shrinking the head packing; numerics are
    unchanged (heads are independent, and per-head accumulation order
    is the same for any hb).

    MMT_ATTN_HB_BWD overrides everything (including the cap) so probes
    can measure any packing.
    """
    env_hb = os.environ.get("MMT_ATTN_HB_BWD")
    hb_pref = int(env_hb) if env_hb else 2
    hb = next((h for h in (hb_pref, 1) if h > 0 and num_heads % h == 0), 1)
    if env_hb is None and os.environ.get("MMT_ATTN_BWD", "fused") == "fused":
        while (hb > 1 and 2 * hb * seq_k * head_dim * (4 + kv_itemsize)
               > 17 * 1024 * 1024):
            hb = max(h for h in range(1, hb) if num_heads % h == 0)
    return hb


def _attention_backward(residuals, g, geometry, block_q, block_k, interpret,
                        dropout_rate=0.0, static_zero=False):
    q, k, v, rel_table, lengths, qk_offsets, out, lse = residuals
    batch, seq_len, num_heads, head_dim = q.shape
    if qk_offsets.shape[0] < 4:  # pad [q_start, k_start(, seed)] layouts
        qk_offsets = jnp.concatenate([
            qk_offsets,
            jnp.zeros((4 - qk_offsets.shape[0],), qk_offsets.dtype),
        ])
    # static_zero: the caller promises the offsets are literal zeros
    # (single-chip public API) -- unlocks the static tile meta.
    q_start, k_start = (0, 0) if static_zero else (qk_offsets[0], qk_offsets[1])
    block_q, block_k, nq, nk, rel_vocab, v_pad, rel_h, meta = _prepare(
        q, k, rel_table, geometry, block_q, block_k, q_start, k_start
    )
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = g.transpose(0, 2, 1, 3)
    out_t = out.transpose(0, 2, 1, 3)
    delta = jnp.einsum(
        "bhsd,bhsd->bhs", dot.astype(jnp.float32), out_t.astype(jnp.float32)
    )[..., None]

    lengths_i = lengths.astype(jnp.int32)
    qoff = qk_offsets.astype(jnp.int32)
    scale = 1.0 / (head_dim**0.5)

    hb = _backward_head_packing(num_heads, k.shape[1], head_dim,
                                k.dtype.itemsize)

    # Corner-fetch recompute buffer (MMT_ATTN_IMG=fetch): the image-id
    # bias is re-added from a precomputed tile instead of the in-kernel
    # select loop under lax.cond -- same trick as the forward.
    imgfetch = (
        rel_vocab > 0 and static_zero and seq_len == k.shape[1]
        and _imgfetch_applicable(geometry, rel_vocab, True, nq, nk)
    )
    img_buf = None
    if imgfetch:
        img_buf = _build_img_corner(
            qt, rel_h, geometry, rel_vocab, block_q, block_k, hb, scale,
        )
    hg_n = num_heads // hb
    img_im_rect = lambda b, h, i1, i2, *_: (  # noqa: E731
        jnp.where((i1 == 0) & (i2 == 0), 1 + b * hg_n + h, 0), 0, 0, 0)
    img_spec_rect = pl.BlockSpec(
        (1, hb, block_q, block_k), img_im_rect,
        memory_space=pltpu.VMEM)

    # Sliding-window pattern: run both backward passes on the static
    # live-tile lists (see _window_tile_list) instead of the rectangular
    # grid with pl.when skips.
    if (rel_vocab and static_zero and geometry is not None
            and geometry.window > 0 and seq_len == k.shape[1]
            and os.environ.get("MMT_ATTN_WINDOW_GRID", "list") == "list"):
        dq_t, dr_bh, dk_t, dv_t = _backward_window_list(
            qt, kt, vt, dot, lse, delta, rel_h, lengths_i, qoff, meta,
            geometry, rel_vocab, v_pad, block_q, block_k, nk, hb, interpret,
            dropout_rate, q.dtype, k.dtype, v.dtype, seq_len,
            img_buf=img_buf)
        drel = jnp.sum(dr_bh, axis=0)[:, :rel_vocab]
        drel = drel.transpose(1, 0, 2).astype(rel_table.dtype)
        dlengths = np.zeros(lengths.shape, dtype=jax.dtypes.float0)
        doffs = np.zeros(qk_offsets.shape, dtype=jax.dtypes.float0)
        return (dq_t.transpose(0, 2, 1, 3), dk_t.transpose(0, 2, 1, 3),
                dv_t.transpose(0, 2, 1, 3), drel, dlengths, doffs)

    qkv_spec_q = pl.BlockSpec((1, hb, block_q, head_dim), _im_q, memory_space=pltpu.VMEM)
    qkv_spec_k = pl.BlockSpec((1, hb, block_k, head_dim), _im_k, memory_space=pltpu.VMEM)
    vec_spec_q = pl.BlockSpec((1, hb, block_q, 1),
                              lambda b, h, qi, ki, *_: (b, h, qi, 0),
                              memory_space=pltpu.VMEM)
    rel_spec = pl.BlockSpec((hb, v_pad, head_dim), lambda b, h, qi, ki, *_: (h, 0, 0),
                            memory_space=pltpu.VMEM) if rel_vocab else None

    # ---- fused one-pass backward (default; MMT_ATTN_BWD=split reverts) ----
    # Measured on v5e at B=8/S=4096 (see ROADMAP): the split schedule's
    # second pass re-pays the logits + bias-select chain; fusing dk/dv
    # into the dq sweep via a full-K VMEM scratch removes it outright.
    if os.environ.get("MMT_ATTN_BWD", "fused") == "fused":
        seq_k = kt.shape[2]
        kv_full_spec = pl.BlockSpec(
            (1, hb, seq_k, head_dim), lambda b, h, qi, ki, *_: (b, h, 0, 0),
            memory_space=pltpu.VMEM)
        in_specs = [qkv_spec_q, qkv_spec_k, qkv_spec_k, qkv_spec_q,
                    vec_spec_q, vec_spec_q]
        args = [qt, kt, vt, dot, lse, delta]
        scratch_kv = [
            pltpu.VMEM((hb, nk, block_k, head_dim), jnp.float32),
            pltpu.VMEM((hb, nk, block_k, head_dim), jnp.float32),
        ]
        if rel_vocab:
            in_specs.append(rel_spec)
            args.append(rel_h)
            if imgfetch:
                in_specs.append(img_spec_rect)
                args.append(img_buf)
            out_shape = (
                jax.ShapeDtypeStruct(qt.shape, q.dtype),
                jax.ShapeDtypeStruct((batch, num_heads, v_pad, head_dim),
                                     jnp.float32),
                jax.ShapeDtypeStruct(kt.shape, k.dtype),
                jax.ShapeDtypeStruct(vt.shape, v.dtype),
            )
            out_specs = (
                qkv_spec_q,
                pl.BlockSpec((1, hb, v_pad, head_dim),
                             lambda b, h, qi, ki, *_: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                kv_full_spec,
                kv_full_spec,
            )
            scratch = [
                pltpu.VMEM((hb, block_q, head_dim), jnp.float32),
                pltpu.VMEM((hb, block_q, v_pad), jnp.float32),
                pltpu.VMEM((hb, v_pad, head_dim), jnp.float32),
            ] + scratch_kv
        else:
            out_shape = (
                jax.ShapeDtypeStruct(qt.shape, q.dtype),
                jax.ShapeDtypeStruct(kt.shape, k.dtype),
                jax.ShapeDtypeStruct(vt.shape, v.dtype),
            )
            out_specs = (qkv_spec_q, kv_full_spec, kv_full_spec)
            scratch = [
                pltpu.VMEM((hb, block_q, head_dim), jnp.float32),
            ] + scratch_kv
        kernel = functools.partial(
            _bwd_fused_kernel, geo=geometry if rel_vocab else None,
            rel_vocab=rel_vocab, v_pad=v_pad, block_q=block_q,
            block_k=block_k, nk=nk, hb=hb, softmax_scale=scale,
            dropout_rate=dropout_rate, imgfetch=imgfetch,
        )
        res = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(batch, num_heads // hb, nq, nk),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(lengths_i, qoff, meta, *args)
        if rel_vocab:
            dq_t, dr_bh, dk_t, dv_t = res
            drel = jnp.sum(dr_bh, axis=0)[:, :rel_vocab]
            drel = drel.transpose(1, 0, 2).astype(rel_table.dtype)
        else:
            dq_t, dk_t, dv_t = res
            drel = None
        dlengths = np.zeros(lengths.shape, dtype=jax.dtypes.float0)
        doffs = np.zeros(qk_offsets.shape, dtype=jax.dtypes.float0)
        return (dq_t.transpose(0, 2, 1, 3), dk_t.transpose(0, 2, 1, 3),
                dv_t.transpose(0, 2, 1, 3), drel, dlengths, doffs)

    # ---- dq (+ dRel) ----
    in_specs = [qkv_spec_q, qkv_spec_k, qkv_spec_k, qkv_spec_q, vec_spec_q, vec_spec_q]
    args = [qt, kt, vt, dot, lse, delta]
    if rel_vocab:
        in_specs.append(rel_spec)
        args.append(rel_h)
        if imgfetch:
            in_specs.append(img_spec_rect)
            args.append(img_buf)
        out_shape = (
            jax.ShapeDtypeStruct(qt.shape, q.dtype),
            jax.ShapeDtypeStruct((batch, num_heads, v_pad, head_dim), jnp.float32),
        )
        out_specs = (
            qkv_spec_q,
            pl.BlockSpec((1, hb, v_pad, head_dim),
                         lambda b, h, qi, ki, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        scratch = [
            pltpu.VMEM((hb, block_q, head_dim), jnp.float32),
            pltpu.VMEM((hb, block_q, v_pad), jnp.float32),
            pltpu.VMEM((hb, v_pad, head_dim), jnp.float32),
        ]
    else:
        out_shape = jax.ShapeDtypeStruct(qt.shape, q.dtype)
        out_specs = qkv_spec_q
        scratch = [pltpu.VMEM((hb, block_q, head_dim), jnp.float32)]

    kernel = functools.partial(
        _bwd_dq_kernel, geo=geometry if rel_vocab else None, rel_vocab=rel_vocab,
        v_pad=v_pad, block_q=block_q, block_k=block_k, nk=nk, hb=hb,
        softmax_scale=scale, dropout_rate=dropout_rate, imgfetch=imgfetch,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_heads // hb, nq, nk),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths_i, qoff, meta, *args)
    if rel_vocab:
        dq_t, dr_bh = res
        drel = jnp.sum(dr_bh, axis=0)[:, :rel_vocab]  # [H, V, D]
        drel = drel.transpose(1, 0, 2).astype(rel_table.dtype)
    else:
        dq_t, drel = res, None

    # ---- dk, dv ----
    def km(b, h, ki, qi, *_):
        return (b, h, ki, 0)

    def qm(b, h, ki, qi, *_):
        return (b, h, qi, 0)

    def vq(b, h, ki, qi, *_):
        return (b, h, qi, 0)

    in_specs2 = [
        pl.BlockSpec((1, hb, block_q, head_dim), qm, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, block_k, head_dim), km, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, block_k, head_dim), km, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, block_q, head_dim), qm, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, block_q, 1), vq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hb, block_q, 1), vq, memory_space=pltpu.VMEM),
    ]
    args2 = [qt, kt, vt, dot, lse, delta]
    if rel_vocab:
        in_specs2.append(
            pl.BlockSpec((hb, v_pad, head_dim), lambda b, h, ki, qi, *_: (h, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args2.append(rel_h)
        if imgfetch:
            in_specs2.append(img_spec_rect)
            args2.append(img_buf)

    # NOTE: in this kernel the grid is (b, h, ki, qi): tile index t = qi*nk+ki.
    kernel2 = functools.partial(
        _bwd_dkv_kernel, geo=geometry if rel_vocab else None, rel_vocab=rel_vocab,
        block_q=block_q, block_k=block_k, nk=nk, hb=hb, softmax_scale=scale,
        dropout_rate=dropout_rate, imgfetch=imgfetch,
    )
    dk_t, dv_t = pl.pallas_call(
        kernel2,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_heads // hb, nk, nq),
            in_specs=in_specs2,
            out_specs=(
                pl.BlockSpec((1, hb, block_k, head_dim), km, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, block_k, head_dim), km, memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((hb, block_k, head_dim), jnp.float32),
                pltpu.VMEM((hb, block_k, head_dim), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(kt.shape, k.dtype),
            jax.ShapeDtypeStruct(vt.shape, v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths_i, qoff, meta, *args2)

    dq = dq_t.transpose(0, 2, 1, 3)
    dk = dk_t.transpose(0, 2, 1, 3)
    dv = dv_t.transpose(0, 2, 1, 3)
    dlengths = np.zeros(lengths.shape, dtype=jax.dtypes.float0)
    doffs = np.zeros(qk_offsets.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, drel, dlengths, doffs


# ============================================================ public API


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11)
)
def _attention(q, k, v, rel_table, lengths, qk_offsets, geometry, block_q,
               block_k, interpret, dropout_rate=0.0, static_zero=False):
    out, _ = _attention_forward(
        q, k, v, rel_table, geometry, lengths, block_q, block_k, interpret,
        q_start=0 if static_zero else qk_offsets[0],
        k_start=0 if static_zero else qk_offsets[1],
        dropout_rate=dropout_rate, dropout_seed=qk_offsets[2],
        batch_start=qk_offsets[3],
    )
    return out


def _attention_fwd(q, k, v, rel_table, lengths, qk_offsets, geometry, block_q,
                   block_k, interpret, dropout_rate=0.0, static_zero=False):
    out, lse = _attention_forward(
        q, k, v, rel_table, geometry, lengths, block_q, block_k, interpret,
        q_start=0 if static_zero else qk_offsets[0],
        k_start=0 if static_zero else qk_offsets[1],
        dropout_rate=dropout_rate, dropout_seed=qk_offsets[2],
        batch_start=qk_offsets[3],
    )
    return out, (q, k, v, rel_table, lengths, qk_offsets, out, lse)


def _attention_bwd(geometry, block_q, block_k, interpret, dropout_rate,
                   static_zero, residuals, g):
    return _attention_backward(
        residuals, g, geometry, block_q, block_k, interpret,
        dropout_rate=dropout_rate, static_zero=static_zero,
    )


_attention.defvjp(_attention_fwd, _attention_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def _attention_norel(q, k, v, lengths, qk_offsets, block_q, block_k, interpret,
                     dropout_rate=0.0, static_zero=False):
    out, _ = _attention_forward(
        q, k, v, None, None, lengths, block_q, block_k, interpret,
        q_start=0 if static_zero else qk_offsets[0],
        k_start=0 if static_zero else qk_offsets[1],
        dropout_rate=dropout_rate, dropout_seed=qk_offsets[2],
        batch_start=qk_offsets[3],
    )
    return out


def _attention_norel_fwd(q, k, v, lengths, qk_offsets, block_q, block_k,
                         interpret, dropout_rate=0.0, static_zero=False):
    out, lse = _attention_forward(
        q, k, v, None, None, lengths, block_q, block_k, interpret,
        q_start=0 if static_zero else qk_offsets[0],
        k_start=0 if static_zero else qk_offsets[1],
        dropout_rate=dropout_rate, dropout_seed=qk_offsets[2],
        batch_start=qk_offsets[3],
    )
    return out, (q, k, v, None, lengths, qk_offsets, out, lse)


def _attention_norel_bwd(block_q, block_k, interpret, dropout_rate,
                         static_zero, residuals, g):
    dq, dk, dv, _, dlengths, doffs = _attention_backward(
        residuals, g, None, block_q, block_k, interpret,
        dropout_rate=dropout_rate, static_zero=static_zero,
    )
    return dq, dk, dv, dlengths, doffs


_attention_norel.defvjp(_attention_norel_fwd, _attention_norel_bwd)


def pallas_relative_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_table: Optional[jnp.ndarray],
    geometry: Optional[RelGeometry],
    lengths: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed=None,
) -> jnp.ndarray:
    """Fused, differentiable relative attention.

    ``dropout_rate`` applies the reference-order attention-probs dropout
    (post-softmax, pre-value-contraction) INSIDE the kernel: the mask is
    a deterministic hash of (dropout_seed, head, global q/k positions),
    regenerated identically in the backward and across sequence shards
    -- no [S, S] mask tensor ever exists.  ``dropout_seed`` (<int32>[])
    is required when dropout_rate > 0; derive it per training step.

    Args:
      q, k, v: <float>[B, S, num_heads, head_dim].
      rel_table: <float32>[V, num_heads, head_dim] or None.
      geometry: static RelGeometry describing the id scheme (None => no
        relative bias).
      lengths: <int32>[B] per-example real lengths (padding masked
        in-kernel, segmented semantics).
      block_q, block_k: tile sizes (clamped to S; must divide S; the
        image block P**2 must fit in one tile).

    Returns:
      <q.dtype>[B, S, num_heads, head_dim].
    """
    if dropout_rate > 0.0 and dropout_seed is None:
        # A silently-defaulted seed would reuse the identical dropout
        # mask every step (and across calls) -- a hard-to-notice
        # training-quality regression.  RelativeAttention derives a
        # per-step seed; any direct caller must too.
        raise ValueError(
            "dropout_seed is required when dropout_rate > 0 "
            "(derive a distinct int32 seed per training step)"
        )
    if (geometry is not None and geometry.window > 0
            and (rel_table is None or geometry.num_global <= 0)):
        raise ValueError(
            "window > 0 requires the relative-bias path (rel_table) and "
            "num_global > 0 (the prefix-global token count)")
    seed = jnp.asarray(
        dropout_seed if dropout_seed is not None else 0, jnp.int32
    )
    offs = jnp.stack([jnp.int32(0), jnp.int32(0), seed, jnp.int32(0)])
    if rel_table is not None and geometry is not None:
        return _attention(
            q, k, v, rel_table, lengths, offs, geometry, block_q, block_k,
            interpret, float(dropout_rate), True,
        )
    return _attention_norel(
        q, k, v, lengths, offs, block_q, block_k, interpret,
        float(dropout_rate), True,
    )


def sequence_sharded_pallas_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_table: Optional[jnp.ndarray],
    geometry: Optional[RelGeometry],
    lengths: jnp.ndarray,
    mesh,
    seq_axis: str = "model",
    batch_axis: Optional[str] = "data",
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed=None,
) -> jnp.ndarray:
    """Sequence-sharded fused attention (forward): shard_map over the mesh.

    Each shard owns a contiguous slice of query rows; K/V are
    all-gathered over ICI inside the shard (one collective per layer) and
    the kernel regenerates relative ids from *global* positions via a
    traced q-offset and traced tile metadata.  This scales the fused
    kernel past one chip's HBM for beyond-4k sequences (the GSPMD path
    covers only the dense XLA attention).  Forward-only for now: training
    at sharded lengths pairs this with gradient checkpointing or the XLA
    path.

    Args: as ``pallas_relative_attention``; q/k/v are *global* [B,S,H,D]
    arrays laid out (batch_axis, seq_axis) on the mesh.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_seq = mesh.shape[seq_axis]
    seq_len = q.shape[1]
    if seq_len % n_seq:
        raise ValueError(f"seq {seq_len} not divisible by {n_seq} shards")

    seed_arr = jnp.asarray(
        dropout_seed if dropout_seed is not None else 0, jnp.int32
    )

    def local_fn(q_l, k_l, v_l, lengths_l, seed_l, *maybe_rel):
        k_full = jax.lax.all_gather(k_l, seq_axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_l, seq_axis, axis=1, tiled=True)
        q_start = jax.lax.axis_index(seq_axis) * q_l.shape[1]
        # Global positions feed the dropout hash too, so shards drop
        # exactly the pairs the single-device kernel would.
        b_start = (
            jax.lax.axis_index(batch_axis) * q_l.shape[0]
            if batch_axis else jnp.int32(0)
        )
        offs = jnp.stack([
            q_start.astype(jnp.int32), jnp.int32(0),
            seed_l.astype(jnp.int32), b_start.astype(jnp.int32),
        ])
        if maybe_rel:
            # Differentiable: custom-VJP kernel; all_gather transposes to
            # reduce-scatter, replicated rel_table grads psum automatically.
            return _attention(
                q_l, k_full, v_full, maybe_rel[0], lengths_l, offs,
                geometry, block_q, block_k, interpret,
                float(dropout_rate), False,
            )
        return _attention_norel(
            q_l, k_full, v_full, lengths_l, offs, block_q, block_k, interpret,
            float(dropout_rate), False,
        )

    spec = P(batch_axis, seq_axis, None, None)
    in_specs = [spec, spec, spec, P(batch_axis), P()]
    args = [q, k, v, lengths, seed_arr]
    if rel_table is not None and geometry is not None:
        in_specs.append(P(None, None, None))
        args.append(rel_table)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=spec,
        check_vma=False,
    )(*args)


def ring_sequence_sharded_pallas_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_table: Optional[jnp.ndarray],
    geometry: Optional[RelGeometry],
    lengths: jnp.ndarray,
    mesh,
    seq_axis: str = "model",
    batch_axis: Optional[str] = "data",
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed=None,
) -> jnp.ndarray:
    """Ring-schedule sequence-sharded fused attention (forward).

    Unlike ``sequence_sharded_pallas_attention`` (one K/V all-gather,
    peak K/V memory O(S)), the ring keeps only one K/V *chunk* resident
    per step (O(S / n)): each step attends the local queries to the held
    chunk with exact global-position geometry (traced q/k offsets), then
    `ppermute`s the chunk around the ring, combining partial outputs
    through their logsumexps -- the flash combine, across devices.  XLA
    overlaps the async collective permute with the next chunk's compute.

    Differentiable: the backward rides the ring too -- each step runs the
    per-chunk fused backward against the *global* logsumexp (which makes
    the chunk-local softmax recompute exact), dQ accumulates locally, and
    dK/dV accumulators travel with their chunks, arriving home after n
    permutes; the relative-table gradient accumulates locally and psums
    through the shard_map transpose.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[seq_axis]
    if q.shape[1] % n:
        raise ValueError(f"seq {q.shape[1]} not divisible by {n} shards")
    perm = [(j, (j + 1) % n) for j in range(n)]

    def _ring_forward(q_l, k_c0, v_c0, rel, lengths_l, my, seed_l, b_start):
        s_loc = q_l.shape[1]
        q_start = my * s_loc

        def step(carry, i):
            out_acc, lse_acc, k_c, v_c = carry
            # After i permutes we hold the chunk originally at (my - i).
            k_start = ((my - i) % n) * s_loc
            out_i, lse_i = _attention_forward(
                q_l, k_c, v_c, rel, geometry, lengths_l,
                block_q, block_k, interpret,
                q_start=q_start, k_start=k_start,
                dropout_rate=dropout_rate, dropout_seed=seed_l,
                batch_start=b_start,
            )
            lse_i = lse_i.transpose(0, 2, 1, 3)  # [B, S_loc, H, 1]
            lse_new = jnp.logaddexp(lse_acc, lse_i)
            # Clamp: fully-padded rows are -inf in every chunk; the
            # weights must come out 0, not exp(-inf - -inf) = NaN.
            lse_c = jnp.maximum(lse_new, jnp.float32(-3e38))
            out_new = (
                jnp.exp(lse_acc - lse_c) * out_acc.astype(jnp.float32)
                + jnp.exp(lse_i - lse_c) * out_i.astype(jnp.float32)
            )
            k_n = jax.lax.ppermute(k_c, seq_axis, perm)
            v_n = jax.lax.ppermute(v_c, seq_axis, perm)
            return (out_new.astype(q_l.dtype), lse_new, k_n, v_n), None

        batch, _, num_heads, head_dim = q_l.shape
        init = (
            jnp.zeros((batch, s_loc, num_heads, head_dim), q_l.dtype),
            jnp.full((batch, s_loc, num_heads, 1), -jnp.inf, jnp.float32),
            k_c0,
            v_c0,
        )
        (out, lse, _, _), _ = jax.lax.scan(step, init, jnp.arange(n))
        return out, lse

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def _ring(q_l, k_l, v_l, rel, lengths_l, my, seed_l, b_start):
        out, _ = _ring_forward(q_l, k_l, v_l, rel, lengths_l, my, seed_l, b_start)
        return out

    def _ring_fwd(q_l, k_l, v_l, rel, lengths_l, my, seed_l, b_start):
        out, lse = _ring_forward(q_l, k_l, v_l, rel, lengths_l, my, seed_l, b_start)
        return out, (q_l, k_l, v_l, rel, lengths_l, my, seed_l, b_start, out, lse)

    def _ring_bwd(res, g):
        q_l, k_l, v_l, rel, lengths_l, my, seed_l, b_start, out, lse = res
        s_loc = q_l.shape[1]
        q_start = my * s_loc
        # Global logsumexp makes the per-chunk backward exact: p_chunk =
        # exp(s_chunk - lse_global).  dK/dV accumulators travel the ring
        # with their chunks and are home after n permutes.
        lse_bhs1 = lse.transpose(0, 2, 1, 3)  # [B, H, S_loc, 1]

        def step(carry, i):
            dq_acc, drel_acc, k_c, v_c, dk_acc, dv_acc = carry
            k_start = ((my - i) % n) * s_loc
            offs = jnp.stack([
                q_start.astype(jnp.int32), k_start.astype(jnp.int32),
                seed_l.astype(jnp.int32), b_start.astype(jnp.int32),
            ])
            residuals = (q_l, k_c, v_c, rel, lengths_l, offs, out, lse_bhs1)
            grads = _attention_backward(
                residuals, g, geometry, block_q, block_k, interpret,
                dropout_rate=dropout_rate,
            )
            dq_i, dk_c, dv_c, drel_i = grads[0], grads[1], grads[2], grads[3]
            dq_acc = dq_acc + dq_i.astype(jnp.float32)
            if drel_acc is not None:
                drel_acc = drel_acc + drel_i.astype(jnp.float32)
            dk_acc = dk_acc + dk_c.astype(jnp.float32)
            dv_acc = dv_acc + dv_c.astype(jnp.float32)
            k_n = jax.lax.ppermute(k_c, seq_axis, perm)
            v_n = jax.lax.ppermute(v_c, seq_axis, perm)
            dk_n = jax.lax.ppermute(dk_acc, seq_axis, perm)
            dv_n = jax.lax.ppermute(dv_acc, seq_axis, perm)
            return (dq_acc, drel_acc, k_n, v_n, dk_n, dv_n), None

        init = (
            jnp.zeros(q_l.shape, jnp.float32),
            jnp.zeros(rel.shape, jnp.float32) if rel is not None else None,
            k_l,
            v_l,
            jnp.zeros(k_l.shape, jnp.float32),
            jnp.zeros(v_l.shape, jnp.float32),
        )
        (dq, drel, _, _, dk, dv), _ = jax.lax.scan(step, init, jnp.arange(n))
        dlen = np.zeros(lengths_l.shape, dtype=jax.dtypes.float0)
        dmy = np.zeros(my.shape, dtype=jax.dtypes.float0)
        dseed = np.zeros(seed_l.shape, dtype=jax.dtypes.float0)
        return (
            dq.astype(q_l.dtype),
            dk.astype(k_l.dtype),
            dv.astype(v_l.dtype),
            drel.astype(rel.dtype) if rel is not None else None,
            dlen,
            dmy,
            dseed,
            np.zeros(b_start.shape, dtype=jax.dtypes.float0),
        )

    _ring.defvjp(_ring_fwd, _ring_bwd)

    seed_arr = jnp.asarray(
        dropout_seed if dropout_seed is not None else 0, jnp.int32
    )

    def local_fn(q_l, k_l, v_l, lengths_l, seed_l, *maybe_rel):
        rel = maybe_rel[0] if maybe_rel else None
        my = jax.lax.axis_index(seq_axis)
        b_start = (
            jax.lax.axis_index(batch_axis) * q_l.shape[0]
            if batch_axis else jnp.int32(0)
        )
        return _ring(q_l, k_l, v_l, rel, lengths_l, my, seed_l,
                     b_start.astype(jnp.int32))

    spec = P(batch_axis, seq_axis, None, None)
    in_specs = [spec, spec, spec, P(batch_axis), P()]
    args = [q, k, v, lengths, seed_arr]
    if rel_table is not None and geometry is not None:
        in_specs.append(P(None, None, None))
        args.append(rel_table)

    from jax import shard_map as _sm

    return _sm(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=spec,
        check_vma=False,
    )(*args)
