"""Tensor-parallel parameter sharding rules over the mesh 'model' axis.

The reference forwards model-parallelism kwargs and then discards them
(``src/distribute_utils.py:136`` -- DP only).  This module supplies the
TPU-native capability: Megatron-style sharding of the transformer's wide
dimensions across the 'model' axis, expressed purely as parameter
shardings -- GSPMD inserts the (all-gather / reduce-scatter) collectives
over ICI.

Rules (per flattened param path):
  attention q/k/v kernels  [H, heads, dh]  -> P(None, 'model', None)
  attention q/k/v bias     [heads, dh]     -> P('model', None)
  attention output kernel  [heads, dh, H]  -> P('model', None, None)
  ffn intermediate kernel  [H, I]          -> P(None, 'model')
  ffn intermediate bias    [I]             -> P('model')
  ffn output kernel        [I, H]          -> P('model', None)
  word embedding table     [V, E]          -> P('model', None)  (vocab)
  everything else          replicated
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_RULES = [
    (r".*/attention/(query|key|value)/kernel", P(None, "model", None)),
    (r".*/attention/(query|key|value)/bias", P("model", None)),
    (r".*/attention/output/kernel", P("model", None, None)),
    (r".*/intermediate/kernel", P(None, "model")),
    (r".*/intermediate/bias", P("model")),
    (r".*/ffn_output/kernel", P("model", None)),
    (r".*word_embeddings/embedding_table", P("model", None)),
]


def param_spec(path: str) -> P:
    for pattern, spec in _RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Places a param pytree on the mesh under the TP rules.

    With mesh.shape['model'] == 1 this degenerates to replication (pure
    DP).  Dimensions not divisible by the axis size fall back to
    replication for that param.
    """
    import flax

    tp = mesh.shape.get("model", 1)
    flat = flax.traverse_util.flatten_dict(
        params["params"] if "params" in params else params
    )

    def place(path, x):
        spec = param_spec("/".join(str(p) for p in path))
        if tp > 1 and spec != P():
            for dim, name in enumerate(spec):
                if name == "model" and x.shape[dim] % tp:
                    spec = P()
                    break
        else:
            spec = spec if tp > 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    placed = {path: place(path, x) for path, x in flat.items()}
    tree = flax.traverse_util.unflatten_dict(placed)
    return {"params": tree} if "params" in params else tree
