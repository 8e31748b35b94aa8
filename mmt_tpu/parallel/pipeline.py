"""Pipeline parallelism: GPipe-style microbatch pipelining of the layer
stack over a mesh 'pipe' axis.

The reference has no pipeline parallelism (its distribution layer is
data-parallel TPUStrategy only, ``src/distribute_utils.py:97-188``);
this module is the TPU-native extension that completes the mesh-axis
family (dp x sp x tp x pp) for deep variants: consecutive transformer
layers are placed on successive devices of the 'pipe' axis, microbatches
stream through the stages, and the moving activation rides ICI via
``ppermute`` -- the scaling-book pipeline recipe expressed with
``shard_map`` + ``lax.scan``.

Design notes:

* The canonical (checkpoint) parameter tree keeps the unrolled
  ``layer_{i}`` layout used everywhere else; ``stack_layer_params``
  builds the [L, ...]-stacked pytree this module consumes and
  ``unstack_layer_params`` maps gradients/params back.  Sharding the
  stacked leading axis over 'pipe' gives each of the S stages L/S
  consecutive layers.
* Schedule: T = M + S - 1 ticks for M microbatches (classic GPipe fill +
  drain).  Each tick every stage applies its layers once and ppermutes
  the activation to the next stage.  During fill/drain a stage computes
  on don't-care data instead of branching -- on TPU a predicated skip
  would not reclaim the step (measured: ``pl.when``/``lax.cond`` tile
  skips cost more than the unconditional work; see ROADMAP.md), and the
  waste is the standard (S-1)/(M+S-1) bubble either way.
* Microbatch side inputs (lengths / dense masks) are kept resident on
  every stage and indexed per tick (`side_micro`, leading M axis);
  batch-shared side inputs pass through unchanged (`side_shared`).
  With the fused Pallas attention path only `lengths` is needed, so the
  resident footprint is trivial.
* The output microbatches all finish on the last stage; they are
  broadcast back with a masked ``psum`` over 'pipe' (differentiable).
* Composes with data parallelism: leaves carrying a batch dimension use
  in/out specs P(None, 'data') on a ('data', 'pipe') mesh, so each
  pipeline instance serves one data shard.
* dtype: with pre-activation layers (the flagship config) the carried
  activation stays in the compute dtype.  With post-activation layers
  the per-layer output is fp32 (final LayerNorm), so the initial carry
  is upcast to fp32 for scan-dtype stability; this upcasts the first
  layer's residual addition to fp32 (values identical, one fewer bf16
  rounding than the unrolled stack).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map


def stack_layer_params(transformer_params: Dict[str, Any], num_layers: int):
    """{'layer_0': sub, ...} -> one pytree with [L, ...]-stacked leaves."""
    subs = [transformer_params[f"layer_{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *subs)


def unstack_layer_params(stacked, num_layers: int) -> Dict[str, Any]:
    """Inverse of ``stack_layer_params`` (works on grads too)."""
    return {
        f"layer_{i}": jax.tree.map(lambda x, i=i: x[i], stacked)
        for i in range(num_layers)
    }


def microbatch(x, num_micro: int):
    """[B, ...] -> [M, B/M, ...] (leading microbatch axis)."""
    return jax.tree.map(
        lambda a: a.reshape((num_micro, a.shape[0] // num_micro) + a.shape[1:]),
        x,
    )


def unmicrobatch(x):
    """[M, b, ...] -> [M*b, ...]."""
    return jax.tree.map(
        lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]), x
    )


def pipeline_layers(
    layer_apply: Callable[[Any, jnp.ndarray, Dict[str, Any]], jnp.ndarray],
    stacked_params,
    x_micro: jnp.ndarray,
    side_micro: Optional[Dict[str, Any]] = None,
    side_shared: Optional[Dict[str, Any]] = None,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: str = "data",
    remat: bool = False,
):
    """Runs the stacked layers as a GPipe pipeline over ``axis``.

    ``layer_apply(layer_params, x, side) -> x`` applies ONE layer;
    ``side`` is the merged per-microbatch + shared side-input dict.
    ``x_micro`` is [M, b, ...]; ``side_micro`` leaves lead with M.
    Returns the [M, b, ...] outputs (replicated over ``axis``, sharded
    over ``data_axis`` when the mesh has one).  Differentiable in
    ``stacked_params`` and ``x_micro``.
    """
    side_micro = side_micro or {}
    side_shared = side_shared or {}
    num_stages = mesh.shape[axis]
    num_micro = x_micro.shape[0]
    num_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if num_layers % num_stages:
        raise ValueError(
            f"{num_layers} layers not divisible by {num_stages} pipeline stages"
        )
    if layer_apply is None:
        raise ValueError("layer_apply is required")
    one_layer = jax.checkpoint(layer_apply) if remat else layer_apply

    has_data = data_axis in mesh.axis_names and mesh.shape[data_axis] > 1
    dspec = P(None, data_axis) if has_data else P()
    pspec = P(axis)

    def body(params_local, x_l, sm_l, ss_l):
        stage = jax.lax.axis_index(axis)
        layers_local = num_layers // num_stages

        def stage_fn(x, side):
            def one(carry, xs):
                lp, li = xs
                s = side
                if "dropout_rng" in side:
                    # Convention: fold the GLOBAL layer index into the
                    # per-microbatch dropout key so every (micro, layer)
                    # pair draws an independent stream.
                    s = dict(side)
                    s["dropout_rng"] = jax.random.fold_in(
                        side["dropout_rng"], stage * layers_local + li
                    )
                return one_layer(lp, carry, s), None

            y, _ = jax.lax.scan(
                one, x, (params_local, jnp.arange(layers_local))
            )
            return y

        # Post-activation layers emit fp32 (final LN); keep the scanned
        # carry dtype stable by probing one layer's output dtype.
        carry_dtype = jax.eval_shape(
            stage_fn,
            x_l[0],
            jax.tree.map(lambda s: s[0], sm_l) | ss_l,
        ).dtype
        x_l = x_l.astype(carry_dtype)

        def tick(carry, t):
            state, outs = carry
            mc = jnp.clip(t - stage, 0, num_micro - 1)
            inject = jax.lax.dynamic_index_in_dim(x_l, mc, 0, keepdims=False)
            state = jnp.where(stage == 0, inject, state)
            side = jax.tree.map(
                lambda s: jax.lax.dynamic_index_in_dim(s, mc, 0, keepdims=False),
                sm_l,
            )
            y = stage_fn(state, side | ss_l)
            valid = (t - stage >= 0) & (t - stage < num_micro)
            write = valid & (stage == num_stages - 1)
            outs = jnp.where(
                write,
                jax.lax.dynamic_update_index_in_dim(outs, y, mc, 0),
                outs,
            )
            state = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % num_stages) for i in range(num_stages)]
            )
            return (state, outs), None

        init = (
            jnp.zeros_like(x_l[0]),
            jnp.zeros(x_l.shape, carry_dtype),
        )
        (_, outs), _ = jax.lax.scan(
            tick, init, jnp.arange(num_micro + num_stages - 1)
        )
        # Only the last stage holds real outputs; masked psum broadcasts
        # them back across the pipe axis.
        outs = outs * (stage == num_stages - 1).astype(outs.dtype)
        return jax.lax.psum(outs, axis)

    # Per-micro dropout keys ([M]-leading key data) are replicated over
    # data; everything [M, b, ...]-batched shards dim 1 over data.
    sm_specs = {
        k: (P(None) if k == "dropout_rng"
            else jax.tree.map(lambda _: dspec, v))
        for k, v in side_micro.items()
    }
    ss_specs = jax.tree.map(lambda _: P(), side_shared)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(pspec, dspec, sm_specs, ss_specs),
        out_specs=dspec,
        check_vma=False,
    )(stacked_params, x_micro, side_micro, side_shared)


def make_encoder_layer_apply(cfg, num_patch_per_row: int):
    """One-layer apply fn for ``pipeline_layers`` from an encoder config.

    Builds the same ``RelativeTransformerLayer`` the encoder's unrolled
    stack uses (``models/relative_attention.py``), so stacked
    ``layer_{i}`` params apply unchanged.  Deterministic unless the side
    dict carries a ``dropout_rng`` key (see ``pipeline_encoder_stack``:
    per-(micro, layer) folded streams make hidden + attention dropout
    work inside the pipeline -- a different derivation than the
    unrolled stack's flax path folds, equally valid dropout).
    """
    from mmt_tpu.models.relative_attention import RelativeTransformerLayer

    layer = RelativeTransformerLayer(
        hidden_size=cfg.hidden_size,
        num_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        relative_vocab_size=cfg.relative_vocab_size,
        hidden_dropout=cfg.hidden_dropout_prob,
        attention_dropout=cfg.attention_probs_dropout_prob,
        initializer_range=cfg.initializer_range,
        use_pre_activation_order=cfg.use_pre_activation_order,
        dtype=jnp.dtype(cfg.compute_dtype),
        attention_impl=cfg.attention_impl,
        block_q=cfg.attention_block_q,
        block_k=cfg.attention_block_k,
        relative_pos_max_distance=cfg.relative_pos_max_distance,
        relative_att_num_core_layers=cfg.relative_att_num_core_layers,
        num_patch_per_row=num_patch_per_row,
    )

    def apply_one(layer_params, x, side):
        rng = side.get("dropout_rng")
        return layer.apply(
            {"params": layer_params},
            x,
            side.get("att_mask"),
            side.get("relative_att_ids"),
            rng is None,  # deterministic unless a dropout key is supplied
            side.get("lengths"),
            rngs=None if rng is None else {"dropout": rng},
        )

    return apply_one


def pipelined_encoder_sequence_output(
    encoder,
    variables,
    batch: Dict[str, jnp.ndarray],
    *,
    mesh: Mesh,
    num_micro: int,
    axis: str = "pipe",
    data_axis: str = "data",
    remat: bool = False,
    dropout_rng=None,
):
    """Full-batch encoder forward with the layer stack pipelined.

    Embeddings/side inputs run replicated over 'pipe' (they are a tiny
    fraction of the FLOPs), the ``layer_{i}`` stack streams over the
    pipeline, and the fp32 sequence output matches
    ``encoder.apply(...)['sequence_output']``.
    """
    emb, att_mask, relative_att_ids = encoder.apply(
        variables,
        batch["word_ids"],
        segment_ids=batch.get("segment_ids"),
        att_mask=batch.get("att_mask"),
        relative_att_ids=batch.get("relative_att_ids"),
        patch_embeddings=batch.get("patch_embeddings"),
        lengths=batch.get("lengths"),
        images=batch.get("images"),
        method="transformer_inputs",
    )
    return pipeline_encoder_stack(
        encoder.config,
        encoder.num_patch_per_row,
        variables["params"],
        emb,
        att_mask,
        relative_att_ids,
        batch.get("lengths"),
        mesh=mesh,
        num_micro=num_micro,
        axis=axis,
        data_axis=data_axis,
        remat=remat,
        dropout_rng=dropout_rng,
    )


def pipeline_encoder_stack(
    cfg,
    num_patch_per_row: int,
    encoder_params,
    emb,
    att_mask,
    relative_att_ids,
    lengths,
    *,
    mesh: Mesh,
    num_micro: int,
    axis: str = "pipe",
    data_axis: str = "data",
    remat: bool = False,
    dropout_rng=None,
):
    """Pipelines the ``layer_{i}`` stack over ready transformer inputs.

    ``encoder_params`` is the encoder's param subtree (the dict holding
    ``transformer``); returns the fp32 [B, S, H] sequence output.
    ``dropout_rng`` (a PRNG key) enables in-layer hidden + attention
    dropout: it splits into one key per microbatch, and the pipeline
    folds the global layer index in per application.
    """
    stacked = stack_layer_params(
        encoder_params["transformer"], cfg.num_hidden_layers
    )
    side_micro: Dict[str, Any] = {}
    side_shared: Dict[str, Any] = {}
    if dropout_rng is not None:
        side_micro["dropout_rng"] = jax.random.split(dropout_rng, num_micro)
    if lengths is not None:
        side_micro["lengths"] = microbatch(lengths, num_micro)
    if att_mask is not None:
        side_micro["att_mask"] = microbatch(att_mask, num_micro)
    if relative_att_ids is not None:
        batch_size = emb.shape[0]
        if relative_att_ids.ndim == 3 and relative_att_ids.shape[0] == batch_size:
            side_micro["relative_att_ids"] = microbatch(
                relative_att_ids, num_micro
            )
        else:
            # [S, S] or [1, S, S]: one id map shared by the whole batch.
            side_shared["relative_att_ids"] = relative_att_ids
    out = pipeline_layers(
        make_encoder_layer_apply(cfg, num_patch_per_row),
        stacked,
        microbatch(emb, num_micro),
        side_micro,
        side_shared,
        mesh=mesh,
        axis=axis,
        data_axis=data_axis,
        remat=remat,
    )
    return unmicrobatch(out).astype(jnp.float32)
