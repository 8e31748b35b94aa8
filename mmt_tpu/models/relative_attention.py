"""Relative-bias multi-head attention and the transformer stack.

Re-provides the capability of ``etcmodel.layers.RelativeTransformerLayers``
(the reference's compute core; call site
``src/modeling/models/mmt_encoder.py:124-135, 220-224``): dense O(S^2)
multi-head self-attention where each (q, k) pair's logit gets an additive
learned bias selected by ``relative_att_ids[q, k]`` from a per-layer
``[relative_vocab, heads, head_dim]`` table (Shaw/ETC-style), masked by
``att_mask``, with pre- or post-activation residual order and a GELU FFN.

Semantics pinned down:

* score(b,h,q,k) = (q . k  +  q . R[id(q,k), h]) / sqrt(head_dim)
* OOV relative ids (id >= relative_vocab_size) contribute **zero** bias
  -- the one-hot-lookup semantic the shipped reference configs depend on
  (their part-padding ids 229/230 overflow vocab 49).
* masked logits get -10000 (BERT/ETC additive mask convention).
* post order: x = LN(x + drop(att(x))); x = LN(x + drop(ffn(x)))
  pre order:  x = x + drop(att(LN(x))); x = x + drop(ffn(LN(x)))
  (shipped configs use pre order: ``use_pre_activation_order: True``).

TPU-first design:

* ``attention_impl='xla'``: einsum content scores + a [B,H,Q,V] q-to-bias
  projection gathered along V (V <= ~49) -- XLA fuses this into the
  attention; no [S,S,V] one-hot is ever materialized.
* ``attention_impl='pallas'``: fused flash-style kernel
  (``mmt_tpu.ops.pallas_attention``) that streams K/V tiles through VMEM,
  applies the relative bias via an unrolled select-accumulate over the
  small id vocabulary, and never materializes [S,S] logits in HBM.
* Softmax and the bias arithmetic run in float32 regardless of the
  compute dtype (bfloat16) for numerical parity.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmt_tpu.ops.quant import dense_cls
from mmt_tpu.ops.relative_attention_ref import relative_attention_scores
from mmt_tpu.ops.pallas_attention import RelGeometry, pallas_relative_attention

NEG_INF = -10000.0


class RelativeAttention(nn.Module):
    hidden_size: int
    num_heads: int
    relative_vocab_size: Optional[int] = None
    attention_dropout: float = 0.1
    initializer_range: float = 0.02
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    block_q: int = 512
    block_k: int = 512
    # Static id-scheme geometry for the fused kernel (regenerates ids from
    # index arithmetic in-kernel; no [S,S] map is ever materialized).
    relative_pos_max_distance: int = 0
    relative_att_num_core_layers: int = 0
    num_patch_per_row: int = 0
    # "none" or "int8_dynamic" (inference-only; see mmt_tpu/ops/quant.py).
    quantize: str = "none"
    # Sliding-window + prefix-global attention pattern (ETC/Longformer
    # style; 0 = dense).  Pair (i, j) attends iff i or j < num_global or
    # |i - j| <= window.  North-star long-context capability -- the
    # reference instantiates only the dense etcmodel stack
    # (src/modeling/models/mmt_encoder.py:124-135).
    attention_window: int = 0
    attention_num_global: int = 0

    @nn.compact
    def __call__(
        self, x, att_mask=None, relative_att_ids=None, deterministic=True, lengths=None
    ):
        """x: [B, S, H]; att_mask: [B, S, S] or [S, S]; ids: [B, S, S] or [S, S].

        ``lengths`` (<int32>[B]) enables the fused Pallas path, which
        computes the padding mask in-kernel instead of consuming
        ``att_mask``.
        """
        assert self.hidden_size % self.num_heads == 0
        if self.quantize != "none" and not deterministic:
            raise ValueError(
                "quantize='int8_dynamic' is an inference-only path "
                "(rounding has zero gradient); train with quantize='none'."
            )
        _, dense_general = dense_cls(self.quantize)
        head_dim = self.hidden_size // self.num_heads
        init = nn.initializers.truncated_normal(stddev=self.initializer_range)
        dense = lambda name: dense_general(  # noqa: E731
            (self.num_heads, head_dim),
            kernel_init=init,
            dtype=self.dtype,
            name=name,
        )
        q = dense("query")(x)  # [B, S, h, d]
        k = dense("key")(x)
        v = dense("value")(x)

        if self.relative_vocab_size:
            rel_table = self.param(
                "relative_emb_table",
                init,
                (self.relative_vocab_size, self.num_heads, head_dim),
                jnp.float32,
            )
        else:
            rel_table = None

        # The fused kernel regenerates ids in-kernel from the static
        # geometry; explicitly-supplied id tensors use the XLA path.
        # "pallas_interpret" runs the kernel in interpreter mode
        # (CPU-testable).  Attention dropout runs INSIDE the kernel
        # (hash mask from a per-call seed) -- the reference-faithful
        # training configs (attention dropout 0.1) stay on the fused
        # path at long sequence lengths.
        use_pallas = (
            self.attention_impl in ("pallas", "pallas_interpret")
            and lengths is not None
            and relative_att_ids is None
        )
        if use_pallas:
            geometry = None
            if self.relative_vocab_size and self.relative_pos_max_distance:
                geometry = RelGeometry(
                    text_max_distance=self.relative_pos_max_distance,
                    num_patch_per_row=self.num_patch_per_row,
                    num_core_layers=self.relative_att_num_core_layers,
                    window=self.attention_window,
                    num_global=self.attention_num_global,
                )
            elif self.attention_window > 0:
                raise ValueError(
                    "attention_window > 0 requires the relative-bias "
                    "geometry on the fused path")
            drop_rate = 0.0
            drop_seed = None
            if not deterministic and self.attention_dropout > 0.0:
                drop_rate = float(self.attention_dropout)
                drop_seed = jax.random.bits(
                    self.make_rng("dropout"), dtype=jnp.uint32
                ).astype(jnp.int32)
            ctx = pallas_relative_attention(
                q,
                k,
                v,
                rel_table,
                geometry,
                lengths,
                block_q=self.block_q,
                block_k=self.block_k,
                interpret=self.attention_impl == "pallas_interpret",
                dropout_rate=drop_rate,
                dropout_seed=drop_seed,
            )
        else:
            logits = relative_attention_scores(q, k, rel_table, relative_att_ids)
            if att_mask is not None:
                mask = att_mask if att_mask.ndim == 3 else att_mask[None]
                logits = logits + (1.0 - mask[:, None].astype(logits.dtype)) * NEG_INF
            if self.attention_window > 0:
                s = x.shape[1]
                i_pos = jnp.arange(s, dtype=jnp.int32)[:, None]
                j_pos = jnp.arange(s, dtype=jnp.int32)[None, :]
                allowed = (
                    (i_pos < self.attention_num_global)
                    | (j_pos < self.attention_num_global)
                    | (jnp.abs(j_pos - i_pos) <= self.attention_window)
                )
                logits = logits + jnp.where(allowed, 0.0, NEG_INF)[None, None]
            probs = jnp.asarray(nn.softmax(logits, axis=-1), dtype=self.dtype)
            probs = nn.Dropout(rate=self.attention_dropout)(
                probs, deterministic=deterministic
            )
            ctx = jnp.einsum(
                "bhqk,bkhd->bqhd", probs, v, preferred_element_type=self.dtype
            )

        out = dense_general(
            self.hidden_size,
            axis=(-2, -1),
            kernel_init=init,
            dtype=self.dtype,
            name="output",
        )(ctx)
        return out


class RelativeTransformerLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    relative_vocab_size: Optional[int] = None
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    initializer_range: float = 0.02
    use_pre_activation_order: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    block_q: int = 512
    block_k: int = 512
    relative_pos_max_distance: int = 0
    relative_att_num_core_layers: int = 0
    num_patch_per_row: int = 0
    quantize: str = "none"
    attention_window: int = 0
    attention_num_global: int = 0

    @nn.compact
    def __call__(
        self, x, att_mask=None, relative_att_ids=None, deterministic=True, lengths=None
    ):
        dense_1d, _ = dense_cls(self.quantize)
        init = nn.initializers.truncated_normal(stddev=self.initializer_range)
        ln = lambda name: nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name=name)  # noqa: E731
        attention = RelativeAttention(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            relative_vocab_size=self.relative_vocab_size,
            attention_dropout=self.attention_dropout,
            initializer_range=self.initializer_range,
            dtype=self.dtype,
            attention_impl=self.attention_impl,
            block_q=self.block_q,
            block_k=self.block_k,
            relative_pos_max_distance=self.relative_pos_max_distance,
            relative_att_num_core_layers=self.relative_att_num_core_layers,
            num_patch_per_row=self.num_patch_per_row,
            quantize=self.quantize,
            attention_window=self.attention_window,
            attention_num_global=self.attention_num_global,
            name="attention",
        )
        dropout = nn.Dropout(rate=self.hidden_dropout)

        def ffn(h):
            h = dense_1d(
                self.intermediate_size, kernel_init=init, dtype=self.dtype,
                name="intermediate",
            )(h)
            # Approximate GELU: reference uses it explicitly for TPU speed
            # (src/modeling/models/mmt_encoder.py:53-54).
            h = nn.gelu(h, approximate=True)
            h = dense_1d(
                self.hidden_size, kernel_init=init, dtype=self.dtype, name="ffn_output"
            )(h)
            return h

        if self.use_pre_activation_order:
            a = attention(
                ln("attention_layer_norm")(x).astype(self.dtype),
                att_mask,
                relative_att_ids,
                deterministic,
                lengths,
            )
            x = x + dropout(a, deterministic=deterministic)
            f = ffn(ln("ffn_layer_norm")(x).astype(self.dtype))
            x = x + dropout(f, deterministic=deterministic)
        else:
            a = attention(x, att_mask, relative_att_ids, deterministic, lengths)
            x = ln("attention_layer_norm")(x + dropout(a, deterministic=deterministic))
            f = ffn(x.astype(self.dtype))
            x = ln("ffn_layer_norm")(x + dropout(f, deterministic=deterministic))
        return x


class RelativeTransformerLayers(nn.Module):
    hidden_size: int
    num_hidden_layers: int
    num_heads: int
    intermediate_size: int
    relative_vocab_size: Optional[int] = None
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    initializer_range: float = 0.02
    use_pre_activation_order: bool = False
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"
    block_q: int = 512
    block_k: int = 512
    relative_pos_max_distance: int = 0
    relative_att_num_core_layers: int = 0
    num_patch_per_row: int = 0
    quantize: str = "none"
    attention_window: int = 0
    attention_num_global: int = 0
    remat: bool = False

    @nn.compact
    def __call__(
        self, x, att_mask=None, relative_att_ids=None, deterministic=True, lengths=None
    ):
        layer_cls = RelativeTransformerLayer
        if self.remat:
            layer_cls = nn.remat(layer_cls, static_argnums=(4,))
        for i in range(self.num_hidden_layers):
            x = layer_cls(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                intermediate_size=self.intermediate_size,
                relative_vocab_size=self.relative_vocab_size,
                hidden_dropout=self.hidden_dropout,
                attention_dropout=self.attention_dropout,
                initializer_range=self.initializer_range,
                use_pre_activation_order=self.use_pre_activation_order,
                dtype=self.dtype,
                attention_impl=self.attention_impl,
                block_q=self.block_q,
                block_k=self.block_k,
                relative_pos_max_distance=self.relative_pos_max_distance,
                relative_att_num_core_layers=self.relative_att_num_core_layers,
                num_patch_per_row=self.num_patch_per_row,
                quantize=self.quantize,
                attention_window=self.attention_window,
                attention_num_global=self.attention_num_global,
                name=f"layer_{i}",
            )(x, att_mask, relative_att_ids, deterministic, lengths)
        return x
