"""Dynamic-int8 serving path: op correctness, checkpoint compatibility,
and end-to-end logit closeness vs the fp path.

TPU-native serving extension (no reference counterpart; the reference's
predict path is fp32/bf16 -- `/root/reference/src/scripts/predict.sh`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmt_tpu.configs.encoder import MmtEncoderConfig
from mmt_tpu.models.classification_model import MmtClassificationModel
from mmt_tpu.ops.quant import (
    Int8Dense,
    Int8DenseGeneral,
    dense_cls,
    dynamic_quantize_activations,
    int8_dot_general,
    quantize_symmetric,
)


def test_quantize_symmetric_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    w_q, scale = quantize_symmetric(w, contracting_dims=(0,))
    assert w_q.dtype == jnp.int8 and scale.shape == (1, 32)
    deq = w_q.astype(jnp.float32) * scale
    # Max error is half a quantization step per channel.
    step = np.asarray(scale)[0]
    err = np.abs(np.asarray(deq - w))
    assert (err <= 0.5 * step + 1e-7).all()


def test_dynamic_activation_range():
    x = jnp.asarray([[-3.0, 0.5], [1.0, 2.0]], jnp.float32)
    x_q, s = dynamic_quantize_activations(x)
    assert int(np.asarray(x_q).min()) == -127
    np.testing.assert_allclose(np.asarray(x_q) * np.asarray(s), np.asarray(x),
                               atol=float(s) / 2 + 1e-7)


def test_int8_dot_general_close_to_fp():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 8, 16)), jnp.float32)
    got = int8_dot_general(x, w, x_contract=(2,), k_contract=(0,))
    want = jnp.einsum("bsk,khd->bshd", x, w)
    # Quantization noise RMS of a K=64 int8 dot is ~1% of the output RMS.
    err = np.asarray(got - want)
    out_rms = float(np.sqrt(np.mean(np.square(np.asarray(want)))))
    err_rms = float(np.sqrt(np.mean(np.square(err))))
    assert err_rms / out_rms < 0.05, (err_rms, out_rms)


@pytest.mark.parametrize("axis,features", [((-1,), (12, 64)), ((-2, -1), 768)])
def test_param_tree_matches_flax_dense_general(axis, features):
    """Int8DenseGeneral must produce the exact nn.DenseGeneral param tree
    (names + shapes + dtypes) so fp32 checkpoints load unchanged."""
    import flax.linen as nn

    x = jnp.ones((2, 3, 12, 64) if axis == (-2, -1) else (2, 3, 768))
    ref = nn.DenseGeneral(features, axis=axis).init(jax.random.PRNGKey(0), x)
    quant = Int8DenseGeneral(features, axis=axis).init(jax.random.PRNGKey(0), x)
    ref_shapes = jax.tree.map(lambda a: (a.shape, a.dtype), ref)
    quant_shapes = jax.tree.map(lambda a: (a.shape, a.dtype), quant)
    assert ref_shapes == quant_shapes


def test_param_tree_matches_flax_dense():
    import flax.linen as nn

    x = jnp.ones((2, 5, 64))
    ref = nn.Dense(32).init(jax.random.PRNGKey(0), x)
    quant = Int8Dense(32).init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(lambda a: (a.shape, a.dtype), ref) == jax.tree.map(
        lambda a: (a.shape, a.dtype), quant)


def test_dense_cls_dispatch():
    import flax.linen as nn

    assert dense_cls("none") == (nn.Dense, nn.DenseGeneral)
    assert dense_cls("int8_dynamic") == (Int8Dense, Int8DenseGeneral)
    with pytest.raises(ValueError):
        dense_cls("int4")


def _tiny_config(quantize):
    from mmt_tpu.configs.encoder import EncoderConfig
    from mmt_tpu.configs.model import ClassificationModelConfig, ClsHeadConfig

    enc = MmtEncoderConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        relative_pos_max_distance=4,
        relative_vocab_size=12,
        max_absolute_position_embeddings=None,
        compute_dtype="float32",
        attention_impl="xla",
        quantize=quantize,
    )
    return ClassificationModelConfig(
        encoder=EncoderConfig(mmt=enc),
        cls_heads=[ClsHeadConfig(inner_dim=64, num_classes=2, name="itm")],
    )


def _tiny_inputs(batch=2, seq=16, n_patches=4):
    rng = np.random.default_rng(7)
    return dict(
        word_ids=jnp.asarray(rng.integers(0, 512, (batch, seq)), jnp.int32),
        segment_ids=jnp.ones((batch, seq), jnp.int32),
        patch_embeddings=jnp.asarray(
            rng.normal(size=(batch, n_patches, 27)), jnp.float32),
        lengths=jnp.asarray([seq, seq - 3], jnp.int32),
    )


def test_classification_model_int8_close_and_checkpoint_compatible():
    """The SAME fp32 params drive both paths; int8 logits stay close."""
    inputs = _tiny_inputs()
    fp = MmtClassificationModel(_tiny_config("none"), num_patch_per_row=2)
    q = MmtClassificationModel(_tiny_config("int8_dynamic"), num_patch_per_row=2)
    params = fp.init(jax.random.PRNGKey(0), **inputs)
    # Checkpoint compatibility: the quantized model accepts the fp tree.
    q_params = q.init(jax.random.PRNGKey(0), **inputs)
    assert jax.tree.map(lambda a: a.shape, params) == jax.tree.map(
        lambda a: a.shape, q_params)

    out_fp = fp.apply(params, **inputs, deterministic=True)["itm_logits"]
    out_q = q.apply(params, **inputs, deterministic=True)["itm_logits"]
    # 2-layer tiny model: quantization noise stays well under 10% of the
    # logit scale (the serving row in bench_suite measures the real
    # model's score deviation).
    scale = max(float(jnp.max(jnp.abs(out_fp))), 1.0)
    assert float(jnp.max(jnp.abs(out_fp - out_q))) / scale < 0.1


def test_int8_training_rejected():
    inputs = _tiny_inputs()
    q = MmtClassificationModel(_tiny_config("int8_dynamic"), num_patch_per_row=2)
    params = q.init(jax.random.PRNGKey(0), **inputs)
    with pytest.raises(ValueError, match="inference-only"):
        q.apply(params, **inputs, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)})
