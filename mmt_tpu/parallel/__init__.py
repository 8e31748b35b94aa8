"""Device mesh and sharding utilities."""

from mmt_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from mmt_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_encoder_stack,
    pipeline_layers,
    pipelined_encoder_sequence_output,
    stack_layer_params,
    unstack_layer_params,
)
