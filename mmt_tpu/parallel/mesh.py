"""Device mesh construction and SPMD sharding rules.

Re-provides the capability of the reference's distribution layer
(``src/distribute_utils.py``: TPUStrategy / Mirrored / MultiWorkerMirrored
/ OneDevice / ParameterServer strategy zoo) the TPU-native way: one
explicit ``jax.sharding.Mesh`` over (data, model) axes.  Gradient
all-reduce, device placement, and per-replica batching all fall out of
GSPMD once inputs are sharded batch-along-'data' and params are
replicated (or sharded along 'model' for large variants):

* tpu / mirrored / multi_worker_mirrored  -> mesh over all devices,
  collectives ride ICI (XLA chooses ring/tree; no NCCL-string plumbing).
* one_device / off                        -> 1-device mesh (same code path).
* parameter_server                        -> not idiomatic on TPU;
  intentionally unsupported (multi-host SPMD replaces it).

Multi-host: ``jax.distributed.initialize()`` + ``jax.devices()`` already
give the global device set; the same mesh code covers one-process-per-host
launches (ICI within slice, DCN across the 'data' axis outer dim).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    num_data: int = 0,
    num_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with ('data', 'model') axes; num_data=0 => all devices / num_model."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data <= 0:
        if len(devices) % num_model:
            raise ValueError(
                f"{len(devices)} devices not divisible by num_model={num_model}"
            )
        num_data = len(devices) // num_model
    use = num_data * num_model
    grid = np.asarray(devices[:use]).reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding along the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Places a host pytree batch onto the mesh, sharded along 'data'.

    Single-process: device_put.  Multi-process (one process per host):
    each process passes its *local* slice of the global batch (the
    loaders shard files per process and yield global/process_count
    examples), assembled into one global array -- the SPMD analog of
    the reference's per-worker ``make_distributed_dataset`` feeding.
    """
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
