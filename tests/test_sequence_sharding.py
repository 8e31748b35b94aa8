"""Sequence-sharded forward over a (data, model) mesh matches unsharded."""

import jax
import jax.numpy as jnp
import numpy as np

from mmt_tpu.configs import ClsHeadConfig, ClassificationModelConfig
from mmt_tpu.configs.encoder import EncoderConfig
from mmt_tpu.models import MmtClassificationModel
from mmt_tpu.parallel import create_mesh
from mmt_tpu.parallel.sequence_sharding import sequence_sharding, shard_token_batch
from tests.test_models import tiny_encoder_config


def _build(S=16, B=4):
    cfg = ClassificationModelConfig(
        encoder=EncoderConfig(mmt=tiny_encoder_config()),
        num_classes=2,
        cls_heads=[ClsHeadConfig(inner_dim=32, num_classes=2, name="itm")],
    )
    model = MmtClassificationModel(cfg, num_patch_per_row=2)
    rng = np.random.default_rng(0)
    inputs = dict(
        word_ids=jnp.asarray(rng.integers(0, 60, (B, S)), jnp.int32),
        segment_ids=jnp.asarray(rng.integers(1, 3, (B, S)), jnp.int32),
        patch_embeddings=jnp.asarray(rng.normal(size=(B, 4, 12)), jnp.float32),
        lengths=jnp.asarray([S, S - 3, S - 1, S], jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **inputs)
    return model, params, inputs


def test_seq_sharded_forward_matches_unsharded():
    model, params, inputs = _build()
    want = np.asarray(model.apply(params, **inputs)["itm_logits"])

    mesh = create_mesh(num_data=2, num_model=4)
    assert mesh.shape == {"data": 2, "model": 4}

    def fwd(params, word_ids, segment_ids, patch_embeddings, lengths):
        return model.apply(
            params,
            word_ids=word_ids,
            segment_ids=segment_ids,
            patch_embeddings=patch_embeddings,
            lengths=lengths,
            deterministic=True,
        )["itm_logits"]

    with mesh:
        sharded = shard_token_batch(mesh, dict(inputs))
        jitted = jax.jit(fwd)
        got = np.asarray(
            jitted(
                params,
                sharded["word_ids"],
                sharded["segment_ids"],
                sharded["patch_embeddings"],
                sharded["lengths"],
            )
        )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # And the input really was laid out over the 'model' axis.
    ws = sharded["word_ids"].sharding
    assert ws == sequence_sharding(mesh)
