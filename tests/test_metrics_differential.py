"""Live differential: the reference's metric masking vs our accumulators.

``PretrainingTask.process_metrics`` (/root/reference/src/tasks/
pretraining.py:198-222) masks MLM/MPP metrics on ITM-negative examples
and pushes through Keras weighted ``SparseCategoricalAccuracy``.  The
method body uses only ``tf`` (no self state) — AST-extracted and exec'd
as a free function under the installed TF, driven with real Keras
metrics over multiple accumulation steps, and compared against our
(total, count) on-device accumulator semantics
(``mmt_tpu/train/metrics.py``, ``train/tasks.py:_accuracy_updates``).
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

_REF = "/root/reference/src/tasks/pretraining.py"


def _load_process_metrics():
    import ast
    import os

    tf = pytest.importorskip("tensorflow")
    if not os.path.exists(_REF):
        pytest.skip("reference tree not present")

    src = open(_REF).read()
    lines = src.splitlines()
    seg = None
    for node in ast.parse(src).body:
        if isinstance(node, ast.ClassDef) and node.name == "PretrainingTask":
            for item in node.body:
                if (isinstance(item, ast.FunctionDef)
                        and item.name == "process_metrics"):
                    body = "\n".join(lines[item.lineno - 1:item.end_lineno])
                    # Dedent the method (class body indent = 2 spaces).
                    seg = "\n".join(
                        ln[2:] if ln.startswith("  ") else ln
                        for ln in body.splitlines()
                    )
    assert seg, "reference layout changed"
    ns = {"tf": tf}
    exec(compile(seg, _REF, "exec"), ns)
    return ns["process_metrics"]


def _our_weighted_accuracy(labels, logits, w):
    correct = (np.argmax(logits, -1) == labels).astype(np.float64)
    return float((correct * w).sum()), float(w.sum())


def test_fuzz_vs_reference_source():
    tf = pytest.importorskip("tensorflow")
    process_metrics = _load_process_metrics()

    rng = np.random.default_rng(20260824)
    for trial in range(10):
        b = int(rng.integers(2, 9))
        m = int(rng.integers(1, 6))
        c = int(rng.integers(3, 20))

        metrics = [
            tf.keras.metrics.SparseCategoricalAccuracy(name="mlm_accuracy"),
            tf.keras.metrics.SparseCategoricalAccuracy(name="mpp_accuracy"),
            tf.keras.metrics.SparseCategoricalAccuracy(name="itm_accuracy"),
        ]
        totals = {"mlm_accuracy": [0.0, 0.0], "mpp_accuracy": [0.0, 0.0],
                  "itm_accuracy": [0.0, 0.0]}

        for _step in range(3):  # accumulation across steps
            labels = {
                "mlm_label_ids": rng.integers(0, c, (b, m)),
                "mlm_label_weights":
                    (rng.random((b, m)) < 0.7).astype(np.float32),
                "mpp_label_ids": rng.integers(0, c, (b, m)),
                "mpp_label_weights":
                    (rng.random((b, m)) < 0.7).astype(np.float32),
                "itm_label_ids": rng.integers(0, 2, (b,)),
                "itm_label_weights": np.ones((b,), np.float32),
            }
            outputs = {
                "mlm_logits": rng.normal(size=(b, m, c)).astype(np.float32),
                "mpp_logits": rng.normal(size=(b, m, c)).astype(np.float32),
                "itm_logits": rng.normal(size=(b, 2)).astype(np.float32),
            }
            process_metrics(
                None,
                metrics,
                {k: tf.constant(v) for k, v in labels.items()},
                {k: tf.constant(v) for k, v in outputs.items()},
            )

            # ours: mask mlm/mpp weights by ITM positives, then (total, count)
            itm = labels["itm_label_ids"].astype(np.float32)[:, None]
            for name, ids, w, lg in (
                ("mlm_accuracy", labels["mlm_label_ids"],
                 labels["mlm_label_weights"] * itm, outputs["mlm_logits"]),
                ("mpp_accuracy", labels["mpp_label_ids"],
                 labels["mpp_label_weights"] * itm, outputs["mpp_logits"]),
                ("itm_accuracy", labels["itm_label_ids"],
                 labels["itm_label_weights"], outputs["itm_logits"]),
            ):
                t, n = _our_weighted_accuracy(ids, lg, w)
                totals[name][0] += t
                totals[name][1] += n

        for metric in metrics:
            t, n = totals[metric.name]
            ours = t / n if n else 0.0
            np.testing.assert_allclose(
                ours, float(metric.result()), rtol=1e-6, atol=1e-7,
                err_msg=f"trial={trial} metric={metric.name}")
