"""ZeRO-1 optimizer-state sharding: same numerics, sharded moments."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mmt_tpu.configs import OptimizationConfig
from mmt_tpu.parallel import create_mesh, shard_batch
from mmt_tpu.parallel.zero import opt_state_specs, shard_opt_state
from mmt_tpu.train.optimizer import create_optimizer
from mmt_tpu.train.train_state import TrainState
from tests.test_train import make_pretrain_task, pretrain_batch


def test_zero1_step_matches_replicated():
    """One dp train step with ZeRO-1 moments == the replicated step
    (params bit-comparable), and the updated moments stay sharded."""
    task = make_pretrain_task()
    batch = pretrain_batch(B=16)
    params = task.init(jax.random.PRNGKey(0), batch)
    tx = create_optimizer(OptimizationConfig(), train_steps=100)
    mesh = create_mesh(num_data=8, num_model=1)
    rng = jax.random.PRNGKey(1)

    s_rep = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    s_z = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    s_z = s_z.replace(opt_state=shard_opt_state(mesh, s_z.opt_state))

    with mesh:
        sharded = shard_batch(mesh, batch)
        step_rep = task.make_train_step(mesh=mesh, micro_batch_size=8)
        step_z = task.make_train_step(mesh=mesh, micro_batch_size=8, zero1=True)
        s_rep, m_rep = step_rep(s_rep, sharded, rng)
        s_z, m_z = step_z(s_z, shard_batch(mesh, batch), rng)

    np.testing.assert_allclose(
        float(m_z["total_loss"][0]), float(m_rep["total_loss"][0]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_z.params),
        jax.tree_util.tree_leaves(s_rep.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )

    # Moments with a divisible leading dim really live sharded.
    specs = jax.tree.leaves(opt_state_specs(mesh, s_z.opt_state))
    leaves = jax.tree.leaves(s_z.opt_state)
    n_sharded = 0
    for spec, leaf in zip(specs, leaves):
        got = leaf.sharding.spec if hasattr(leaf.sharding, "spec") else P()
        if spec == P("data"):
            assert got == P("data",) or got == P("data"), (spec, got)
            n_sharded += 1
    assert n_sharded > 0


def test_zero1_specs_replicate_indivisible():
    mesh = create_mesh(num_data=8, num_model=1)
    tree = {
        "w": jnp.zeros((16, 4)),   # divisible -> sharded
        "b": jnp.zeros((3,)),      # not divisible -> replicated
        "count": jnp.zeros(()),    # scalar -> replicated
    }
    specs = opt_state_specs(mesh, tree)
    assert specs["w"] == P("data")
    assert specs["b"] == P()
    assert specs["count"] == P()
