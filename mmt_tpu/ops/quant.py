"""Dynamic int8 quantized dense layers (TPU serving path).

No reference counterpart (`/root/reference` is fp32/bf16 throughout) --
this is a TPU-native serving extension: TPU v5e's MXU executes s8 x s8 ->
s32 matmuls at 2x the bf16 rate (394 vs 197 TOPS), and at the reference's
shipped retrieval configs (S=256/512, `src/scripts/predict.sh:27`) the
dense projections + FFN dominate the encoder FLOPs, so post-training
dynamic quantization is a large serving win with no checkpoint changes.

Scheme (standard PTQ-dynamic, BERT-style):

* Weights: symmetric per-output-channel int8 (scale = max|w| / 127 over
  the contracting dims, one scale per output feature).  Quantized from
  the fp32 checkpoint params at trace time inside the forward -- an
  O(K*F) pass that is negligible next to the O(B*S*K*F) matmul, and
  keeps the checkpoint format and param tree byte-identical to the
  fp path.
* Activations: symmetric per-tensor *dynamic* int8 (scale measured from
  the live batch's max|x|), so no calibration data is needed.
* Accumulation in int32 (`preferred_element_type`), dequantized by
  act_scale * channel_scale, bias added in fp32.

Only the big dense weights go int8; embeddings, LayerNorms, softmax,
the attention S^2 contractions, and heads stay in the usual
bf16/fp32 mix -- those are either accuracy-critical or FLOP-trivial.

The modules mirror ``flax.linen.Dense`` / ``DenseGeneral`` param trees
exactly (same "kernel"/"bias" names and shapes), so a trained fp32
checkpoint loads into the quantized model unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def quantize_symmetric(w: jnp.ndarray, contracting_dims: Sequence[int]):
    """Symmetric int8 quantization with one scale per output channel.

    Returns ``(w_q int8, scale f32)`` where ``scale`` has the
    contracting dims reduced away (kept as size-1 for broadcasting) and
    ``w ~= w_q * scale``.
    """
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=tuple(contracting_dims), keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def dynamic_quantize_activations(x: jnp.ndarray):
    """Per-tensor dynamic symmetric int8: ``(x_q int8, scale f32 scalar)``."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def int8_dot_general(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    x_contract: Sequence[int],
    k_contract: Sequence[int],
) -> jnp.ndarray:
    """Quantize-on-the-fly s8 x s8 -> s32 dot_general, dequantized to f32.

    ``x_contract`` / ``k_contract`` are the contracting dimension lists
    (batch dims unsupported -- the dense layers here have none).
    """
    x_q, x_scale = dynamic_quantize_activations(x)
    w_q, w_scale = quantize_symmetric(kernel, k_contract)
    acc = jax.lax.dot_general(
        x_q,
        w_q,
        (((*x_contract,), (*k_contract,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Output layout: x's kept dims then kernel's kept dims; w_scale with
    # its contracting dims squeezed broadcasts over the kernel kept dims.
    out_scale = x_scale * jnp.squeeze(w_scale, axis=tuple(k_contract))
    return acc.astype(jnp.float32) * out_scale


def _normalize_axes(axes: Tuple[int, ...], ndim: int) -> Tuple[int, ...]:
    return tuple(sorted(ax % ndim for ax in axes))


class Int8DenseGeneral(nn.Module):
    """Drop-in ``nn.DenseGeneral`` with the dynamic-int8 compute path.

    Param tree ("kernel" fp32 [*in_axes, *features], "bias" [*features])
    is identical to ``nn.DenseGeneral`` -- fp32 checkpoints load
    unchanged.  ``dtype`` only sets the *output* dtype (accumulation is
    int32, dequantization fp32).
    """

    features: Union[int, Tuple[int, ...]]
    axis: Union[int, Tuple[int, ...]] = -1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        features = self.features if isinstance(self.features, tuple) else (
            self.features,)
        axis = self.axis if isinstance(self.axis, tuple) else (self.axis,)
        axis = _normalize_axes(axis, inputs.ndim)
        kernel_shape = tuple(inputs.shape[a] for a in axis) + features
        kernel = self.param("kernel", self.kernel_init, kernel_shape,
                            jnp.float32)
        out = int8_dot_general(
            inputs, kernel,
            x_contract=axis,
            k_contract=tuple(range(len(axis))),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, features, jnp.float32)
            out = out + bias
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return out


class Int8Dense(Int8DenseGeneral):
    """Drop-in ``nn.Dense`` (single output feature dim, last-axis input)."""

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        assert isinstance(self.features, int)
        kernel = self.param(
            "kernel", self.kernel_init, (inputs.shape[-1], self.features),
            jnp.float32)
        out = int8_dot_general(inputs, kernel, x_contract=(inputs.ndim - 1,),
                               k_contract=(0,))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            out = out + bias
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return out


def dense_cls(quantize: str):
    """(<dense_cls>, <dense_general_cls>) for a config ``quantize`` mode."""
    if quantize in ("none", "", None):
        return nn.Dense, nn.DenseGeneral
    if quantize == "int8_dynamic":
        return Int8Dense, Int8DenseGeneral
    raise ValueError(f"Unknown quantize mode {quantize!r}; "
                     "expected 'none' or 'int8_dynamic'.")
