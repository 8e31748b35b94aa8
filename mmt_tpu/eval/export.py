"""Serving-artifact export: the scoring computation as portable StableHLO.

The reference's serving story is "rebuild the Keras model in a Python
process and restore a checkpoint" every time (``src/predict.py:105-146``).
For production TPU serving this module adds a TPU-native surface with no
reference counterpart: the jitted scoring function is serialized with
``jax.export`` into a self-contained artifact (StableHLO + calling
convention) that a serving process can ``load_scoring`` and call WITHOUT
the model code, flax, or the config system.

Design choices:

* **Symbolic batch dimension** — one artifact serves any batch size
  (shape-polymorphic export over ``b``); all other dims are static, as
  the loaders guarantee fixed shapes (the retrieval loader pads the
  final batch).
* **Params are call arguments, not baked constants** — one artifact
  serves every checkpoint of the same geometry, and the artifact stays
  small (42 KB for the test encoder vs MBs of weights).
* **Cross-platform** — pass ``platforms=("cpu", "tpu")`` to lower for
  both from one process.  Caveat: the fused Pallas attention lowers to a
  TPU custom call, so a TPU-targeted artifact must be exported with
  ``attention_impl='pallas'`` from a TPU-visible process (or export the
  ``'xla'`` dense path, which lowers everywhere).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax import export as jax_export

from mmt_tpu.train.tasks import _model_inputs

__all__ = ["export_scoring", "load_scoring", "scoring_inputs"]


def scoring_inputs(batch):
    """The model-input subset of a loader batch (drops labels/indices)."""
    return _model_inputs(batch)


def export_scoring(
    task,
    params,
    example_batch,
    platforms: Optional[Sequence[str]] = None,
    symbolic_batch: bool = True,
) -> bytes:
    """Serializes ``task``'s inference step to a portable artifact.

    Args:
      task: a ``ClassificationTask`` (the retrieval/ITM scoring model).
      params: a params pytree (shapes/dtypes define the artifact's
        weight signature; the values are NOT baked in).
      example_batch: one loader batch; its non-batch dims fix the
        artifact's static shapes (seq len, patch grid).
      platforms: lowering targets, e.g. ``("cpu", "tpu")``; default is
        the current backend.
      symbolic_batch: export with a polymorphic batch dimension (one
        artifact, any batch size).  Mosaic kernels do not lower with
        symbolic shapes, so ``attention_impl='pallas'`` configs must
        pass False and export one artifact per serving batch size (the
        example_batch's leading dim; measured on TPU, see the kernel
        export probe in ROADMAP).

    Returns:
      ``bytes`` — pass to ``load_scoring`` (or write to disk).
    """
    inputs = _model_inputs(example_batch)

    def fwd(params, inputs):
        outputs = task.model.apply(params, **inputs, deterministic=True)
        logits = outputs[task.logits_key]
        if task.num_classes == 1:
            return jax.nn.sigmoid(logits.reshape(-1))
        if task.num_classes == 2:
            return jax.nn.softmax(logits, axis=-1)[:, 1]
        return jax.numpy.argmax(logits, axis=-1).astype(jax.numpy.float32)

    if symbolic_batch:
        scope = jax_export.SymbolicScope()
        (b,) = jax_export.symbolic_shape("b", scope=scope)

        def spec(x):
            return jax.ShapeDtypeStruct((b,) + x.shape[1:], x.dtype)
    else:
        def spec(x):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)

    input_specs = jax.tree.map(spec, inputs)
    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    exported = jax_export.export(
        jax.jit(fwd),
        platforms=None if platforms is None else list(platforms),
    )(param_specs, input_specs)
    return bytes(exported.serialize())


def load_scoring(blob: bytes):
    """Deserializes an artifact; returns an object with ``.call(params,
    inputs)`` (use ``scoring_inputs`` to filter a loader batch)."""
    return jax_export.deserialize(bytearray(blob))
