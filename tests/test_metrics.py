"""Host metric tests (goldens computed with tf.keras.metrics.AUC)."""

import numpy as np

from mmt_tpu.eval.metrics_host import auc_pr


def test_auc_pr_matches_keras_golden():
    # Golden values from tf.keras.metrics.AUC(curve='PR') on this exact data.
    rng = np.random.default_rng(0)
    goldens = [0.909368, 0.872385, 0.868683]
    for trial in range(3):
        labels = rng.integers(0, 2, 500)
        probs = np.clip(rng.random(500) * 0.6 + labels * 0.3, 0, 1)
        weights = rng.random(500)
        got = auc_pr(labels, probs, weights)
        np.testing.assert_allclose(got, goldens[trial], atol=2e-5)


def test_auc_pr_perfect_classifier():
    labels = np.array([0, 0, 1, 1])
    probs = np.array([0.1, 0.2, 0.8, 0.9])
    assert auc_pr(labels, probs) > 0.99


def test_auc_pr_unweighted_default():
    labels = np.array([0, 1, 0, 1, 1])
    probs = np.array([0.3, 0.6, 0.4, 0.7, 0.2])
    v = auc_pr(labels, probs)
    assert 0.0 <= v <= 1.0 + 1e-6
