"""Device mesh and sharding utilities."""

from mmt_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
