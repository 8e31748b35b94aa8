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

__all__ = [
    "export_scoring", "load_scoring", "scoring_inputs",
    "export_scoring_bundle", "load_scoring_bundle", "BundledScorer",
]


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


# ----------------------------------------------------- bucketed bundles
#
# Mosaic kernels reject symbolic shapes, so Pallas configs export
# STATIC-batch artifacts.  A bundle packages a small set of batch-size
# buckets (default 1/8/32) plus a manifest into one zip; the loader
# pads each request up to the smallest covering bucket (splitting
# oversized requests into max-bucket chunks) and slices the scores
# back.  Padding rows are zero examples with length 0 -- the fused
# kernel skips all their tiles and every consumer reads only the real
# rows, so bucket-padded scores are identical to direct calls.
# (Exceeds the reference's checkpoint-only serving story,
# src/prediction_helper.py:190-195.)

BUNDLE_MANIFEST = "manifest.json"


def export_scoring_bundle(
    task, params, example_batch, batch_sizes: Sequence[int] = (1, 8, 32),
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """One zip holding a static-batch artifact per bucket size."""
    import io
    import json
    import zipfile

    import numpy as np

    sizes = sorted(set(int(b) for b in batch_sizes))
    if not sizes or sizes[0] < 1:
        raise ValueError(f"invalid batch_sizes {batch_sizes}")
    inputs = _model_inputs(example_batch)

    def resized(b):
        def fit(x):
            x = np.asarray(x)
            reps = -(-b // x.shape[0])
            return np.tile(x, (reps,) + (1,) * (x.ndim - 1))[:b]
        return jax.tree.map(fit, inputs)

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for b in sizes:
            blob = export_scoring(
                task, params, resized(b), platforms=platforms,
                symbolic_batch=False,
            )
            zf.writestr(f"bucket_{b}.bin", blob)
        zf.writestr(BUNDLE_MANIFEST, json.dumps({
            "format": "mmt_tpu.scoring_bundle.v1",
            "batch_sizes": sizes,
        }))
    return buf.getvalue()


class BundledScorer:
    """Callable over a bucket bundle: pads to the next bucket, splits
    oversize requests into max-bucket chunks, slices scores back."""

    def __init__(self, buckets):
        self._buckets = dict(sorted(buckets.items()))
        self.batch_sizes = list(self._buckets)

    def _pad(self, inputs, b):
        import numpy as np

        def pad(x):
            x = np.asarray(x)
            if x.shape[0] == b:
                return x
            pad_rows = np.zeros((b - x.shape[0],) + x.shape[1:], x.dtype)
            return np.concatenate([x, pad_rows])

        padded = {k: pad(v) for k, v in inputs.items()}
        return padded

    def call(self, params, inputs):
        import numpy as np

        inputs = _model_inputs(inputs)
        n = int(next(iter(inputs.values())).shape[0])
        sizes = self.batch_sizes
        chunks, out = [], []
        start = 0
        while start < n:
            rest = n - start
            b = next((s for s in sizes if s >= rest), sizes[-1])
            take = min(rest, b)
            chunk = {k: v[start:start + take] for k, v in inputs.items()}
            chunks.append((self._pad(chunk, b), b, take))
            start += take
        for padded, b, take in chunks:
            scores = np.asarray(self._buckets[b].call(params, padded))
            out.append(scores[:take])
        return np.concatenate(out) if out else np.zeros((0,), np.float32)


def load_scoring_bundle(blob: bytes) -> BundledScorer:
    import io
    import json
    import zipfile

    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        manifest = json.loads(zf.read(BUNDLE_MANIFEST))
        if manifest.get("format") != "mmt_tpu.scoring_bundle.v1":
            raise ValueError(f"not a scoring bundle: {manifest}")
        buckets = {
            b: load_scoring(zf.read(f"bucket_{b}.bin"))
            for b in manifest["batch_sizes"]
        }
    return BundledScorer(buckets)
