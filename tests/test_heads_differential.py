"""Live differential: the reference's MaskedPP head source vs ours.

``MaskedPP`` (/root/reference/src/modeling/layers/
masked_patch_prediction_layer.py) needs only two externals: TFM's
``tf_utils.get_shape_list`` (stubbed with static shapes) and the
reference's own ``tensor_utils.gather_indexes`` (AST-extracted and exec'd
alongside).  We build the Keras layer, transplant its initialized weights
into our flax ``MaskedPPHead``, and require identical logits — pinning
the gather semantics, fp32 LayerNorm, and the activation-then-extra-bias
quirk against the reference's own executing code.

The activation is ``tf.nn.gelu(approximate=True)``: the reference always
builds this layer with ``tf_utils.get_activation(config.mpp_activation)``
(src/tasks/pretraining.py:85), and TFM's get_activation('gelu') is the
approximate form.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from mmt_tpu.models.heads import MaskedPPHead

_LAYER = ("/root/reference/src/modeling/layers/"
          "masked_patch_prediction_layer.py")
_TENSOR_UTILS = "/root/reference/src/tensor_utils.py"


def _load_reference_masked_pp():
    import ast
    import os
    import types

    tf = pytest.importorskip("tensorflow")
    if not os.path.exists(_LAYER):
        pytest.skip("reference tree not present")

    tf_utils_stub = types.SimpleNamespace(
        get_shape_list=lambda t, expected_rank=None, name=None:
            [int(d) for d in t.shape]
    )

    tu_src = open(_TENSOR_UTILS).read()
    lines = tu_src.splitlines()
    seg = None
    for node in ast.parse(tu_src).body:
        if getattr(node, "name", None) == "gather_indexes":
            seg = "\n".join(lines[node.lineno - 1:node.end_lineno])
    assert seg, "reference layout changed"
    tu_ns = {"tf": tf, "tf_utils": tf_utils_stub}
    exec(compile(seg, _TENSOR_UTILS, "exec"), tu_ns)

    layer_ns = {
        "tf": tf,
        "tf_utils": tf_utils_stub,
        "tensor_utils": types.SimpleNamespace(
            gather_indexes=tu_ns["gather_indexes"]),
    }
    src = open(_LAYER).read()
    src = src.replace("from official.modeling import tf_utils", "")
    src = src.replace("import tensor_utils", "")
    # Keras 3 (installed TF) forbids '/' in layer names; the rename is
    # cosmetic (checkpoint naming only, no math).
    src = src.replace("'transform/LayerNorm'", "'transform_LayerNorm'")
    src = src.replace("'transform/dense'", "'transform_dense'")
    # Keras 3 add_weight takes `shape` first; pass the name by keyword.
    src = src.replace("'output_bias/bias',", "name='output_bias_bias',")
    exec(compile(src, _LAYER, "exec"), layer_ns)
    return layer_ns["MaskedPP"]


def test_masked_pp_logits_match_reference_source():
    tf = pytest.importorskip("tensorflow")
    MaskedPP = _load_reference_masked_pp()

    rng = np.random.default_rng(20260823)
    for trial in range(5):
        b = int(rng.integers(1, 4))
        s = int(rng.integers(6, 16))
        d = int(rng.integers(4, 24))
        m = int(rng.integers(1, s + 1))
        classes = int(rng.integers(3, 40))

        seq = rng.normal(size=(b, s, d)).astype(np.float32)
        pos = rng.integers(0, s, (b, m)).astype(np.int32)

        layer = MaskedPP(
            output_num_classes=classes,
            activation=lambda x: tf.nn.gelu(x, approximate=True),
        )
        ref = layer(tf.constant(seq), tf.constant(pos)).numpy()

        params = {
            "transform_layer_norm": {
                "scale": layer.layer_norm.gamma.numpy(),
                "bias": layer.layer_norm.beta.numpy(),
            },
            "transform_dense": {
                "kernel": layer.dense.kernel.numpy(),
                "bias": layer.dense.bias.numpy(),
            },
            "output_bias": layer.bias.numpy(),
        }
        ours = MaskedPPHead(num_classes=classes).apply(
            {"params": params}, seq, pos)

        np.testing.assert_allclose(
            np.asarray(ours), ref, rtol=1e-5, atol=1e-5,
            err_msg=f"trial={trial} b={b} s={s} d={d} m={m} c={classes}")
