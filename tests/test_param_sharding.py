"""Tensor-parallel param sharding: sharded forward == replicated forward."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mmt_tpu.parallel import create_mesh, shard_batch
from mmt_tpu.parallel.param_sharding import param_spec, shard_params
from tests.test_sequence_sharding import _build


def test_param_spec_rules():
    assert param_spec("encoder/transformer/layer_0/attention/query/kernel") == P(
        None, "model", None
    )
    assert param_spec("encoder/transformer/layer_0/intermediate/kernel") == P(
        None, "model"
    )
    assert param_spec("encoder/transformer/layer_0/ffn_output/kernel") == P(
        "model", None
    )
    assert param_spec("encoder/word_embeddings/embedding_table") == P("model", None)
    assert param_spec("encoder/embeddings_layer_norm/scale") == P()


def test_tp_forward_matches_replicated():
    model, params, inputs = _build()
    want = np.asarray(model.apply(params, **inputs)["itm_logits"])

    mesh = create_mesh(num_data=2, num_model=2)

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
        sp = shard_params(mesh, params)
        sb = shard_batch(mesh, dict(inputs))
        got = np.asarray(
            jax.jit(fwd)(
                sp, sb["word_ids"], sb["segment_ids"],
                sb["patch_embeddings"], sb["lengths"],
            )
        )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # Wide params really are laid out across the 'model' axis (tiny
    # config has 2 heads -> tp=2 divides; tp=4 would fall back).
    qk = sp["params"]["encoder"]["transformer"]["layer_0"]["attention"]["query"][
        "kernel"
    ]
    assert qk.sharding.spec == P(None, "model", None)


def test_tp_training_step():
    """Grad step with TP-sharded params produces finite loss."""
    from mmt_tpu.configs import OptimizationConfig
    from mmt_tpu.train.optimizer import create_optimizer
    from mmt_tpu.train.train_state import TrainState

    model, params, inputs = _build()
    mesh = create_mesh(num_data=2, num_model=2)
    labels = jnp.asarray([0, 1, 1, 0], jnp.int32)

    def loss_fn(p, batch, labels):
        logits = model.apply(
            p,
            word_ids=batch["word_ids"],
            segment_ids=batch["segment_ids"],
            patch_embeddings=batch["patch_embeddings"],
            lengths=batch["lengths"],
            deterministic=True,
        )["itm_logits"]
        import optax

        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    with mesh:
        sp = shard_params(mesh, params)
        sb = shard_batch(mesh, dict(inputs))
        tx = create_optimizer(OptimizationConfig(), 10)
        state = TrainState.create(sp, tx)

        @jax.jit
        def step(state, batch, labels):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, labels)
            return state.apply_gradients(grads), loss

        state, loss = step(state, sb, jax.device_put(labels))
    assert np.isfinite(float(loss))
