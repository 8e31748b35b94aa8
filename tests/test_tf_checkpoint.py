"""TF-checkpoint converter tests with a synthetic reference-shaped ckpt."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmt_tpu.configs import ClsHeadConfig, ClassificationModelConfig
from mmt_tpu.configs.encoder import EncoderConfig
from mmt_tpu.models import MmtClassificationModel
from tests.test_models import tiny_encoder_config


def _target():
    cfg = ClassificationModelConfig(
        encoder=EncoderConfig(mmt=tiny_encoder_config()),
        num_classes=2,
        cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
    )
    model = MmtClassificationModel(cfg, num_patch_per_row=2)
    inputs = dict(
        word_ids=jnp.zeros((1, 8), jnp.int32),
        patch_embeddings=jnp.zeros((1, 4, 12), jnp.float32),
        lengths=jnp.full((1,), 8, jnp.int32),
    )
    return model.init(jax.random.PRNGKey(0), **inputs)


def test_convert_synthetic_reference_checkpoint(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from mmt_tpu.train.tf_checkpoint import convert_tf_checkpoint, load_tf_checkpoint

    target = _target()
    import flax

    flat = flax.traverse_util.flatten_dict(target["params"])

    # Build a TF checkpoint whose object paths mimic the reference encoder's
    # attribute naming, with values = index markers for identification.
    class Obj(tf.Module):
        pass

    model = Obj()
    model.encoder = Obj()
    enc = model.encoder
    rng = np.random.default_rng(0)

    def var(shape):
        return tf.Variable(rng.normal(size=shape).astype(np.float32))

    enc._word_embedding_layer = Obj()
    enc._word_embedding_layer.embedding_table = var(
        flat[("encoder", "word_embeddings", "embedding_table")].shape
    )
    enc._segment_embedding_layer = Obj()
    enc._segment_embedding_layer.embedding_table = var(
        flat[("encoder", "segment_embeddings", "embedding_table")].shape
    )
    enc._patch_embedding_projection = Obj()
    enc._patch_embedding_projection.kernel = var(
        flat[("encoder", "patch_embedding_projection", "kernel")].shape
    )
    enc._patch_embedding_projection.bias = var(
        flat[("encoder", "patch_embedding_projection", "bias")].shape
    )
    enc._embedding_norm_layer = Obj()
    enc._embedding_norm_layer.gamma = var(
        flat[("encoder", "embeddings_layer_norm", "scale")].shape
    )
    enc._embedding_norm_layer.beta = var(
        flat[("encoder", "embeddings_layer_norm", "bias")].shape
    )

    ckpt = tf.train.Checkpoint(model=model)
    path = ckpt.write(str(tmp_path / "ref_ckpt"))

    tf_vars = load_tf_checkpoint(path)
    assert "encoder/_word_embedding_layer/embedding_table" in tf_vars

    converted = convert_tf_checkpoint(tf_vars, target, strict=False)
    cflat = flax.traverse_util.flatten_dict(converted["params"])
    np.testing.assert_array_equal(
        cflat[("encoder", "word_embeddings", "embedding_table")],
        enc._word_embedding_layer.embedding_table.numpy(),
    )
    np.testing.assert_array_equal(
        cflat[("encoder", "embeddings_layer_norm", "scale")],
        enc._embedding_norm_layer.gamma.numpy(),
    )
    # Unmatched params keep their fresh init.
    key = ("encoder", "transformer", "layer_0", "attention", "query", "kernel")
    np.testing.assert_array_equal(cflat[key], flat[key])


def test_strict_raises_on_missing():
    from mmt_tpu.train.tf_checkpoint import convert_tf_checkpoint

    with pytest.raises(ValueError, match="unmatched"):
        convert_tf_checkpoint({}, _target(), strict=True)


def test_tf_layout_round_trip_identity():
    # JAX -> TF-layout -> JAX must reproduce EVERY leaf bit-exactly with
    # strict=True: pins that the converter's rules + suffix matching
    # cover the full classification param tree (the residual-risk oracle
    # substitute from docs/RISKS.md; real etcmodel ckpts are
    # uninstallable here).
    import flax

    from mmt_tpu.train.tf_checkpoint import (
        convert_tf_checkpoint,
        export_tf_layout,
    )

    target = _target()
    exported = export_tf_layout(target)
    # TF layouts: q/k/v kernels flattened to 2-D like the reference.
    qk = exported[
        "encoder/_transformer_layers/attention_layers/0/query_projection/kernel"
    ]
    assert qk.ndim == 2

    # Fresh-init template with different values: every leaf must come
    # from the exported dict, not survive from the template.
    template = jax.tree.map(lambda x: x * 0 - 1.0, target)
    restored = convert_tf_checkpoint(exported, template, strict=True)

    want = flax.traverse_util.flatten_dict(target["params"])
    got = flax.traverse_util.flatten_dict(restored["params"])
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg="/".join(k))


def test_pretrain_tf_layout_round_trip_identity():
    # Same round trip over the PRETRAIN model (MLM/MPP heads included).
    import flax

    from mmt_tpu.configs import PretrainModelConfig
    from mmt_tpu.models import MmtPretrainingModel
    from mmt_tpu.train.tf_checkpoint import (
        convert_tf_checkpoint,
        export_tf_layout,
    )

    cfg = PretrainModelConfig(
        encoder=EncoderConfig(mmt=tiny_encoder_config()),
        cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
    )
    model = MmtPretrainingModel(cfg, num_patch_per_row=2)
    inputs = dict(
        word_ids=jnp.zeros((1, 8), jnp.int32),
        patch_embeddings=jnp.zeros((1, 4, 12), jnp.float32),
        lengths=jnp.full((1,), 8, jnp.int32),
        mlm_positions=jnp.zeros((1, 2), jnp.int32),
        mpp_positions=jnp.zeros((1, 2), jnp.int32),
    )
    target = model.init(jax.random.PRNGKey(0), **inputs)
    exported = export_tf_layout(target)
    template = jax.tree.map(lambda x: x * 0 - 1.0, target)
    restored = convert_tf_checkpoint(exported, template, strict=True)
    want = flax.traverse_util.flatten_dict(target["params"])
    got = flax.traverse_util.flatten_dict(restored["params"])
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg="/".join(k))
