"""Fused Pallas TPU kernel: flash attention with ETC/MMT relative bias.

Replaces the reference's compute core (etcmodel
``RelativeTransformerLayers`` dense attention, call site
``src/modeling/models/mmt_encoder.py:220-224``) with a TPU-native design:

* Flash-style online softmax: K/V stream through VMEM tiles; the [S, S]
  logits matrix never exists in HBM.  At S=4096 this turns O(S^2) HBM
  traffic into O(S).
* **No relative-id tensor exists anywhere**: the MMT id scheme (2D patch
  window + clipped 1D text + part padding) is a closed-form function of
  positions, so the kernel regenerates ids from index arithmetic
  (broadcasted iotas) only where they are needed:
    - far-from-diagonal text pairs are *clipped* to a single id per side
      (right -> D, left -> 2D) => two masked rank-1 bias terms, no loop;
    - the exact |offset| <= D diagonal band exists only in tiles that
      intersect it => a per-offset select-accumulate that runs under a
      ``lax.cond`` gated by per-tile static band bounds (scalar
      prefetched), so off-band tiles skip it entirely;
    - the 2D image-image block lives in a single tile (P^2 <= block) and
      is handled there under its own ``lax.cond`` with a select loop over
      the small fine+direction vocabulary;
    - part-padding ids (image->text, text->image) are OOV in the shipped
      configs => exactly zero bias (one-hot semantics); when a config's
      vocab does cover them, two more masked rank-1 terms apply them.
* Padding masks are computed in-kernel from per-example lengths
  (scalar-prefetched) with the reference's segmented semantics
  (real<->real and pad<->pad attend); masked logits get the additive
  -10000 used by the dense XLA path, keeping the two paths numerically
  aligned.

Numerics: logits, softmax statistics, and the accumulator are float32
regardless of input dtype (bfloat16 q/k/v supported).
"""

from __future__ import annotations

import dataclasses
import functools
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
    """

    text_max_distance: int
    num_patch_per_row: int = 0
    num_core_layers: int = 0

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


def _build_tile_meta(
    geo: RelGeometry, seq_len: int, block_q: int, block_k: int
) -> np.ndarray:
    """Per-tile scalars: [T, 4] = (band_lo, band_hi, has_img, unused).

    band_lo/hi bound the offsets (k - q) in [-D, D] that actually occur in
    the tile; an empty band is (1, 0).  has_img marks tiles intersecting
    the image-image block.
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
            # Tile kind: far-from-diagonal all-text tiles clip to a single
            # id (0: right/id D, 1: left/id 2D) => rank-1 bias, no
            # per-element work; kind 2 takes the general path.
            all_text = qi * block_q >= geo.image_len and ki * block_k >= geo.image_len
            if lo > hi and all_text and off_min > d:
                kind = 0
            elif lo > hi and all_text and off_max < -d:
                kind = 1
            else:
                kind = 2
            meta[qi * nk + ki] = (lo, hi, has_img, kind)
    return meta


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


def _kernel(
    lengths_ref,  # SMEM <int32>[B]
    meta_ref,  # SMEM <int32>[T, 4]
    q_ref,  # VMEM [1, 1, bq, d]
    k_ref,  # VMEM [1, 1, bk, d]
    v_ref,  # VMEM [1, 1, bk, d]
    *rest,  # (rel_ref [1, V_pad, d] if rel) then o_ref, m/l/acc scratches
    geo: Optional[RelGeometry],
    rel_vocab: int,
    block_q: int,
    block_k: int,
    nk: int,
    softmax_scale: float,
):
    if rel_vocab:
        rel_ref, o_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        rel_ref = None
        o_ref, m_scratch, l_scratch, acc_scratch = rest

    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    t = qi * nk + ki

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]  # [bq, d]
    k = k_ref[0, 0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]

    if rel_vocab:
        dtd = geo.text_max_distance
        img_len = geo.image_len
        # [bq, V_pad] bias projection (one small MXU matmul).
        qr = jax.lax.dot_general(
            q, rel_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        kind = meta_ref[t, 3]

        # Far all-text tiles (kind 0/1): every offset clips to one id =>
        # bias is a single broadcast column, no per-element [bq,bk] work.
        def far_bias(s):
            is_right = (kind == 0).astype(qr.dtype)
            col = qr[:, dtd] * is_right + qr[:, 2 * dtd] * (1.0 - is_right)
            return s + col[:, None]

        # General tiles: masked rank-1 clip zones + gated diagonal band +
        # (single tile) 2D image block.
        def general_bias(s):
            i_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            j_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            offs = j_pos - i_pos
            text_pair = (
                (i_pos >= img_len) & (j_pos >= img_len) if img_len else None
            )

            def tmask(x):
                return jnp.where(text_pair, x, 0.0) if text_pair is not None else x

            bias = tmask(
                jnp.where(offs > dtd, qr[:, dtd][:, None], 0.0)
                + jnp.where(offs < -dtd, qr[:, 2 * dtd][:, None], 0.0)
            )

            # Measured on v5e: a single gated loop beats both per-offset
            # lax.cond gating (branch overhead) and bf16 band arithmetic
            # (layout conversions).
            band_lo = meta_ref[t, 0]
            band_hi = meta_ref[t, 1]

            def band_bias(bias):
                add = jnp.zeros_like(bias)
                for off_val in range(-dtd, dtd + 1):
                    vid = off_val if off_val >= 0 else dtd - off_val
                    add = add + jnp.where(offs == off_val, qr[:, vid][:, None], 0.0)
                return bias + tmask(add)

            bias = jax.lax.cond(band_lo <= band_hi, band_bias, lambda x: x, bias)

            if img_len:
                # 2D image-image block (single tile: P**2 <= block sizes).
                def image_bias(bias):
                    ids2d = _image_ids_2d(i_pos, j_pos, geo)
                    add = jnp.zeros_like(bias)
                    for vid in range(min(geo.num_image_ids, rel_vocab)):
                        add = add + jnp.where(ids2d == vid, qr[:, vid][:, None], 0.0)
                    imask = (i_pos < img_len) & (j_pos < img_len)
                    return bias + jnp.where(imask, add, 0.0)

                bias = jax.lax.cond(
                    meta_ref[t, 2] == 1, image_bias, lambda x: x, bias
                )

                # Part-padding ids: zero bias when OOV (shipped configs);
                # masked rank-1 terms when the vocab covers them.
                if geo.text_part_id < rel_vocab:
                    bias = bias + jnp.where(
                        (i_pos < img_len) & (j_pos >= img_len),
                        qr[:, geo.text_part_id][:, None],
                        0.0,
                    )
                if geo.image_part_id < rel_vocab:
                    bias = bias + jnp.where(
                        (i_pos >= img_len) & (j_pos < img_len),
                        qr[:, geo.image_part_id][:, None],
                        0.0,
                    )
            return s + bias

        s = jax.lax.cond(kind == 2, general_bias, far_bias, s)

    s = s * softmax_scale

    # In-kernel segmented padding mask from the example's real length.
    length = lengths_ref[b]

    def apply_length_mask(s):
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        same_segment = (q_pos < length) == (k_pos < length)
        return s + jnp.where(same_segment, 0.0, NEG_INF)

    tile_end = jnp.maximum((qi + 1) * block_q, (ki + 1) * block_k)
    s = jax.lax.cond(length < tile_end, apply_length_mask, lambda s: s, s)

    m_prev = m_scratch[:, 0]
    l_prev = l_scratch[:, 0]
    m_cur = jnp.max(s, axis=1)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, None])
    l_next = l_prev * alpha + jnp.sum(p, axis=1)

    m_scratch[...] = jnp.broadcast_to(m_next[:, None], m_scratch.shape)
    l_scratch[...] = jnp.broadcast_to(l_next[:, None], l_scratch.shape)

    v_tile = v_ref[0, 0]
    pv = jax.lax.dot_general(
        p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[...] = acc_scratch[...] * alpha[:, None] + pv

    @pl.when(ki == pl.num_programs(3) - 1)
    def _finalize():
        out = acc_scratch[...] / l_scratch[:, 0][:, None]
        o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("geometry", "block_q", "block_k", "interpret"),
)
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
) -> jnp.ndarray:
    """Fused relative attention.

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
    batch, seq_len, num_heads, head_dim = q.shape
    block_q = min(block_q, seq_len)
    block_k = min(block_k, seq_len)
    if seq_len % block_q or seq_len % block_k:
        raise ValueError(f"seq_len {seq_len} not divisible by {block_q}/{block_k}")

    have_rel = rel_table is not None and geometry is not None
    if have_rel and geometry.image_len > min(block_q, block_k):
        raise ValueError(
            f"image block ({geometry.image_len}) must fit in one tile "
            f"({block_q}x{block_k})"
        )

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    nq, nk = seq_len // block_q, seq_len // block_k
    grid = (batch, num_heads, nq, nk)

    if have_rel:
        rel_vocab = rel_table.shape[0]
        v_pad = _round_up(rel_vocab, 128)
        rel_h = jnp.pad(
            rel_table.astype(q.dtype).transpose(1, 0, 2),
            ((0, 0), (0, v_pad - rel_vocab), (0, 0)),
        )  # [H, V_pad, d]
        meta = jnp.asarray(_build_tile_meta(geometry, seq_len, block_q, block_k))
    else:
        rel_vocab = 0
        meta = jnp.zeros((nq * nk, 4), jnp.int32)

    def im_q(b, h, qi, ki, *_):
        return (b, h, qi, 0)

    def im_k(b, h, qi, ki, *_):
        return (b, h, ki, 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, head_dim), im_q, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, head_dim), im_k, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, head_dim), im_k, memory_space=pltpu.VMEM),
    ]
    args = [qt, kt, vt]
    if have_rel:
        in_specs.append(
            pl.BlockSpec(
                (1, rel_h.shape[1], head_dim),
                lambda b, h, qi, ki, *_: (h, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(rel_h)

    kernel = functools.partial(
        _kernel,
        geo=geometry if have_rel else None,
        rel_vocab=rel_vocab,
        block_q=block_q,
        block_k=block_k,
        nk=nk,
        softmax_scale=1.0 / (head_dim**0.5),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, head_dim), im_q,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), meta, *args)

    return out.transpose(0, 2, 1, 3)
