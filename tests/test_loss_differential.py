"""Live differential: the reference's loss source vs ``mmt_tpu.train.losses``.

``weighted_sparse_categorical_crossentropy_loss`` (/root/reference/src/
modeling/losses/weighted_sparse_categorical_crossentropy_loss.py) imports
only TensorFlow -- exec'd verbatim under the installed TF and fuzzed
against our optax implementation, including the divide-no-nan all-zero-
weights case and the pos_weights path.
"""

import os

import numpy as np
import pytest

from mmt_tpu.train.losses import weighted_sparse_categorical_crossentropy_loss

_REF = ("/root/reference/src/modeling/losses/"
        "weighted_sparse_categorical_crossentropy_loss.py")


class _MetricStub:
    def __init__(self, name):
        self.name = name
        self.value = None

    def update_state(self, v):
        self.value = float(v)


def _load_reference_loss():
    tf = pytest.importorskip("tensorflow")
    if not os.path.exists(_REF):
        pytest.skip("reference tree not present")
    ns = {"tf": tf}
    exec(compile(open(_REF).read(), _REF, "exec"), ns)
    return ns["weighted_sparse_categorical_crossentropy_loss"]


def test_fuzz_vs_reference_source():
    ref_loss = _load_reference_loss()
    import tensorflow as tf

    rng = np.random.default_rng(20260822)
    for trial in range(50):
        n = int(rng.integers(1, 65))
        c = int(rng.integers(2, 50))
        logits = rng.normal(size=(n, c)).astype(np.float32) * 5.0
        labels = rng.integers(0, c, (n,)).astype(np.int32)
        case = trial % 4
        if case == 0:
            weights = np.ones((n,), np.float32)
        elif case == 1:
            weights = (rng.random(n) < 0.6).astype(np.float32)
        elif case == 2:
            weights = np.zeros((n,), np.float32)  # divide_no_nan -> 0
        else:
            weights = rng.random(n).astype(np.float32)
        pos = (rng.random(n).astype(np.float32) * 3.0
               if trial % 3 == 0 else None)

        metric = _MetricStub("head_loss")
        ref = float(ref_loss(
            tf.constant(logits), tf.constant(labels), tf.constant(weights),
            [metric], "head",
            pos_weights=None if pos is None else tf.constant(pos)))
        ours = float(weighted_sparse_categorical_crossentropy_loss(
            logits, labels, weights, pos_weights=pos))

        np.testing.assert_allclose(
            ours, ref, rtol=1e-5, atol=1e-6,
            err_msg=f"trial={trial} n={n} c={c} case={case} "
                    f"pos={'y' if pos is not None else 'n'}")
        # The reference also pushes the loss into its metric.
        np.testing.assert_allclose(metric.value, ref, rtol=1e-6)
