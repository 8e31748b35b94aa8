"""On-device accumulating metrics as a pytree.

Re-provides the reference's Keras-metric surface (``src/tasks/
pretraining.py:183-222``, ``src/tasks/classification.py:126-170``:
weighted SparseCategoricalAccuracy, Mean losses, AUC-PR) TPU-natively:
each metric is a (total, count) float32 pair living in the train step's
carry, updated with pure ops and summed across the data mesh axis by the
same pjit that reduces gradients.  AUC-PR is computed on host from
streamed (probs, labels) at eval time (``mmt_tpu.eval.metrics_host``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

MetricState = Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]  # name -> (total, count)


def zeros_like_metrics(names) -> MetricState:
    return {n: (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)) for n in names}


def update_mean(state: MetricState, name: str, value, weight=1.0) -> MetricState:
    total, count = state[name]
    new = dict(state)
    new[name] = (total + value * weight, count + weight)
    return new


def update_weighted_accuracy(
    state: MetricState, name: str, labels, logits, weights
) -> MetricState:
    """Weighted sparse categorical accuracy (Keras semantics)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    w = jnp.asarray(weights, jnp.float32)
    total, count = state[name]
    new = dict(state)
    new[name] = (total + jnp.sum(correct * w), count + jnp.sum(w))
    return new


def finalize(state: MetricState) -> Dict[str, float]:
    return {
        n: float(total / count) if float(count) else 0.0
        for n, (total, count) in state.items()
    }


def merge(a: MetricState, b: MetricState) -> MetricState:
    out = dict(a)
    for n, (t, c) in b.items():
        if n in out:
            out[n] = (out[n][0] + t, out[n][1] + c)
        else:
            out[n] = (t, c)
    return out
