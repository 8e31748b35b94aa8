"""Pipeline parallelism: GPipe layer pipelining matches the unrolled
stack (forward and gradients) on (data, pipe) meshes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mmt_tpu.models import MmtEncoder
from mmt_tpu.parallel.pipeline import (
    microbatch,
    pipeline_layers,
    pipelined_encoder_sequence_output,
    stack_layer_params,
    unmicrobatch,
    unstack_layer_params,
    make_encoder_layer_apply,
)
from tests.test_models import tiny_encoder_config


def _build(num_layers=4, B=4, S=16, **cfg_kw):
    cfg = tiny_encoder_config(num_hidden_layers=num_layers, **cfg_kw)
    enc = MmtEncoder(config=cfg, num_patch_per_row=2)
    rng = np.random.default_rng(0)
    inputs = dict(
        word_ids=jnp.asarray(rng.integers(0, 60, (B, S)), jnp.int32),
        segment_ids=jnp.asarray(rng.integers(1, 3, (B, S)), jnp.int32),
        patch_embeddings=jnp.asarray(rng.normal(size=(B, 4, 12)), jnp.float32),
        lengths=jnp.asarray([S, S - 3, S - 1, S][:B], jnp.int32),
    )
    params = enc.init(jax.random.PRNGKey(0), **inputs)
    return enc, params, inputs


def _mesh(data, pipe):
    devs = np.asarray(jax.devices()[: data * pipe]).reshape(data, pipe)
    return Mesh(devs, ("data", "pipe"))


def test_stack_unstack_roundtrip():
    enc, params, _ = _build()
    tp = params["params"]["transformer"]
    stacked = stack_layer_params(tp, 4)
    back = unstack_layer_params(stacked, 4)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tp,
        back,
    )


def test_microbatch_roundtrip():
    x = jnp.arange(24.0).reshape(4, 6)
    np.testing.assert_array_equal(
        np.asarray(unmicrobatch(microbatch(x, 2))), np.asarray(x)
    )


@pytest.mark.parametrize("data,pipe,num_micro", [(2, 4, 2), (1, 4, 4)])
def test_pipeline_forward_matches_sequential(data, pipe, num_micro):
    enc, params, inputs = _build()
    want = np.asarray(enc.apply(params, **inputs)["sequence_output"])
    mesh = _mesh(data, pipe)

    got = np.asarray(
        jax.jit(
            lambda p: pipelined_encoder_sequence_output(
                enc, p, inputs, mesh=mesh, num_micro=num_micro
            )
        )(params)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pipeline_eight_stages_deep_stack():
    """8 stages x 1 layer each over a pipe-only mesh (every device a
    stage; fill/drain dominated schedule) still matches the unrolled
    stack."""
    enc, params, inputs = _build(num_layers=8)
    want = np.asarray(enc.apply(params, **inputs)["sequence_output"])
    mesh = _mesh(1, 8)
    got = np.asarray(
        pipelined_encoder_sequence_output(
            enc, params, inputs, mesh=mesh, num_micro=4
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pipeline_forward_post_activation_order():
    """Post-activation layers emit fp32; the pipeline carry upcasts."""
    enc, params, inputs = _build(use_pre_activation_order=False)
    want = np.asarray(enc.apply(params, **inputs)["sequence_output"])
    mesh = _mesh(2, 4)
    got = np.asarray(
        pipelined_encoder_sequence_output(
            enc, params, inputs, mesh=mesh, num_micro=2
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pipeline_bf16_pre_activation():
    """Flagship dtype: bf16 compute, pre-activation order -- the carry
    stays bf16 through every stage and matches the unrolled stack."""
    enc, params, inputs = _build(compute_dtype="bfloat16")
    want = np.asarray(enc.apply(params, **inputs)["sequence_output"])
    mesh = _mesh(2, 4)
    got = np.asarray(
        pipelined_encoder_sequence_output(
            enc, params, inputs, mesh=mesh, num_micro=2
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_pipeline_with_fused_attention_kernel():
    """Pipeline x fused Pallas attention (interpret mode): each stage
    runs the fused kernel on its full-sequence microbatch."""
    enc, params, inputs = _build(
        attention_impl="pallas_interpret",
        attention_block_q=8,
        attention_block_k=8,
    )
    want = np.asarray(enc.apply(params, **inputs)["sequence_output"])
    mesh = _mesh(2, 4)
    got = np.asarray(
        pipelined_encoder_sequence_output(
            enc, params, inputs, mesh=mesh, num_micro=2
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match():
    enc, params, inputs = _build()
    mesh = _mesh(2, 4)
    tgt = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 16, 32)), jnp.float32
    )

    def loss_seq(p):
        out = enc.apply(p, **inputs)["sequence_output"]
        return jnp.mean((out - tgt) ** 2)

    def loss_pipe(p):
        out = pipelined_encoder_sequence_output(
            enc, p, inputs, mesh=mesh, num_micro=2
        )
        return jnp.mean((out - tgt) ** 2)

    g_seq = jax.grad(loss_seq)(params)
    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    flat_s = jax.tree_util.tree_leaves_with_path(g_seq)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_pipe))
    assert len(flat_s) == len(flat_p)
    for path, a in flat_s:
        b = flat_p[path]
        np.testing.assert_allclose(
            np.asarray(b),
            np.asarray(a),
            atol=2e-5,
            rtol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipeline_remat_matches():
    enc, params, inputs = _build()
    mesh = _mesh(2, 4)

    def loss(p, remat):
        out = pipelined_encoder_sequence_output(
            enc, p, inputs, mesh=mesh, num_micro=2, remat=remat
        )
        return jnp.sum(out**2)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        ),
        g0,
        g1,
    )


def test_pipelined_pretrain_step_matches_plain():
    """Full pretraining train step (MLM+MPP+ITM, AdamW) through the
    pipeline == the plain step: same loss, same updated params."""
    from tests.test_train import make_pretrain_task, pretrain_batch
    from mmt_tpu.configs import OptimizationConfig
    from mmt_tpu.train.optimizer import create_optimizer
    from mmt_tpu.train.train_state import TrainState
    from mmt_tpu.parallel import shard_batch

    task = make_pretrain_task(num_hidden_layers=4)
    batch = pretrain_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=100)
    s_plain = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    s_pipe = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    rng = jax.random.PRNGKey(1)

    plain = task.make_train_step()
    s_plain, m_plain = plain(s_plain, batch, rng)

    mesh = _mesh(2, 4)
    with mesh:
        piped = task.make_pipelined_train_step(mesh, num_micro=2)
        s_pipe, m_pipe = piped(s_pipe, shard_batch(mesh, batch), rng)

    np.testing.assert_allclose(
        float(m_pipe["total_loss"][0]),
        float(m_plain["total_loss"][0]),
        rtol=1e-5,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        s_pipe.params,
        s_plain.params,
    )


def test_pipelined_classification_step_matches_plain():
    """Finetune (ITM classification) step through the pipeline == plain."""
    from tests.test_train import make_classification_task, classification_batch
    from mmt_tpu.configs import OptimizationConfig
    from mmt_tpu.train.optimizer import create_optimizer
    from mmt_tpu.train.train_state import TrainState
    from mmt_tpu.parallel import shard_batch

    task = make_classification_task(num_hidden_layers=4)
    batch = classification_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=100)
    s_plain = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    s_pipe = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    rng = jax.random.PRNGKey(1)

    s_plain, m_plain = task.make_train_step()(s_plain, batch, rng)
    mesh = _mesh(2, 4)
    with mesh:
        s_pipe, m_pipe = task.make_pipelined_train_step(mesh, num_micro=2)(
            s_pipe, shard_batch(mesh, batch), rng
        )
    np.testing.assert_allclose(
        float(m_pipe["total_loss"][0]),
        float(m_plain["total_loss"][0]),
        rtol=1e-5,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        s_pipe.params,
        s_plain.params,
    )


def test_pipelined_step_with_dropout():
    """Reference-faithful dropout configs train through the pipeline:
    per-(micro, layer) folded keys drive hidden+attention dropout.
    Deterministic given the rng; different rngs -> different losses."""
    from tests.test_train import make_pretrain_task, pretrain_batch
    from mmt_tpu.configs import OptimizationConfig
    from mmt_tpu.train.optimizer import create_optimizer
    from mmt_tpu.train.train_state import TrainState
    from mmt_tpu.parallel import shard_batch

    task = make_pretrain_task(
        num_hidden_layers=4, hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1,
    )
    batch = pretrain_batch()
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=100)
    mesh = _mesh(2, 4)

    def one_step(rng):
        state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
        with mesh:
            step = task.make_pipelined_train_step(mesh, num_micro=2)
            _, metrics = step(state, shard_batch(mesh, batch), rng)
        return float(metrics["total_loss"][0])

    l_a = one_step(jax.random.PRNGKey(1))
    l_a2 = one_step(jax.random.PRNGKey(1))
    l_b = one_step(jax.random.PRNGKey(2))
    assert np.isfinite(l_a) and np.isfinite(l_b)
    assert l_a == l_a2  # deterministic given the rng
    assert l_a != l_b  # dropout actually draws from the rng


def test_pipeline_layers_rejects_indivisible_stages():
    enc, params, inputs = _build(num_layers=3)
    mesh = _mesh(1, 4)
    cfg = enc.config
    stacked = stack_layer_params(params["params"]["transformer"], 3)
    x = microbatch(jnp.zeros((4, 16, 32), jnp.float32), 2)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_layers(
            make_encoder_layer_apply(cfg, 2), stacked, x, mesh=mesh
        )
