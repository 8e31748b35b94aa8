"""Tasks: pretraining (MLM+MPP+ITM) and classification (ITM finetune).

Parity surface: ``src/tasks/pretraining.py`` and
``src/tasks/classification.py`` -- build_model / build_losses /
train_step / validation_step semantics, re-expressed as pure jitted
functions over an SPMD mesh:

* The reference's manual gradient-accumulation loop with tensor rotation
  (``src/tasks/pretraining.py:242-274``) becomes a ``jax.lax.scan`` over
  micro-batches: grads of (loss / num_micro_steps) are summed, exactly
  reproducing the reference's mean-gradient semantics with static shapes
  and no buffer rotation.
* Cross-replica gradient reduction is implicit: the batch is sharded
  along the mesh 'data' axis, params are replicated, and GSPMD inserts
  the psum over ICI where TF used TPUStrategy all-reduce.
* MLM/MPP losses and metrics are masked on ITM-negative examples
  (``src/tasks/pretraining.py:101-110, 198-222``).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmt_tpu.configs.experiments import (
    ClassificationTaskConfig,
    PretrainingTaskConfig,
    TrainerConfig,
)
from mmt_tpu.models import MmtClassificationModel, MmtPretrainingModel
from mmt_tpu.train import losses as losses_lib
from mmt_tpu.train.train_state import TrainState

MODEL_INPUT_KEYS = (
    "word_ids",
    "segment_ids",
    "att_mask",
    "relative_att_ids",
    "patch_embeddings",
    "lengths",
    "images",  # device-side patch extraction (ship_raw_images)
    "patch_mask",  # device-side MPP patch zeroing (pretraining raw path)
)


def _model_inputs(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: batch[k] for k in MODEL_INPUT_KEYS if k in batch}


def _batch_sharding_constraint(tree, mesh: Optional[Mesh]):
    if mesh is None:
        return tree
    return jax.lax.with_sharding_constraint(
        tree, NamedSharding(mesh, P(None, "data"))
    )


def _pipelined_sequence_output(model, enc_cfg, params, batch, deterministic,
                               pipeline, dropout_rng=None):
    """fp32 [B, S, H] sequence output with the encoder stack pipelined
    over the 'pipe' mesh axis (``mmt_tpu.parallel.pipeline``).

    Hidden + in-kernel attention dropout run inside the pipelined layers
    from per-(micro, layer) folded keys derived off ``dropout_rng`` -- a
    different (equally valid) stream derivation than the unrolled
    stack's flax path folds.  The embedding dropout in
    ``transformer_inputs`` and the head dropout keep the caller's
    rngs.
    """
    from mmt_tpu.parallel.pipeline import pipeline_encoder_stack

    mesh, num_micro, remat = pipeline
    has_layer_dropout = not deterministic and (
        enc_cfg.hidden_dropout_prob or enc_cfg.attention_probs_dropout_prob
    )
    layer_rng = None
    if has_layer_dropout:
        if dropout_rng is None:
            raise ValueError(
                "Pipelined training with dropout needs a dropout rng."
            )
        layer_rng = jax.random.fold_in(dropout_rng, 0x9E3779B9)
    inputs = _model_inputs(batch)
    emb, att_mask, rel_ids = model.apply(
        params,
        inputs["word_ids"],
        segment_ids=inputs.get("segment_ids"),
        att_mask=inputs.get("att_mask"),
        relative_att_ids=inputs.get("relative_att_ids"),
        patch_embeddings=inputs.get("patch_embeddings"),
        lengths=inputs.get("lengths"),
        images=inputs.get("images"),
        patch_mask=inputs.get("patch_mask"),
        deterministic=deterministic,
        method="encoder_inputs",
        rngs=None if dropout_rng is None else {"dropout": dropout_rng},
    )
    return pipeline_encoder_stack(
        enc_cfg,
        model.num_patch_per_row,
        params["params"]["encoder"],
        emb,
        att_mask,
        rel_ids,
        inputs.get("lengths"),
        mesh=mesh,
        num_micro=num_micro,
        remat=remat,
        dropout_rng=layer_rng,
    )


def _make_pipelined_step(task, mesh: Mesh, num_micro: int, remat: bool,
                         zero1: bool = False):
    if "pipe" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'pipe' axis")
    pipeline = (mesh, num_micro, remat)

    def step(state: TrainState, batch, rng):
        def loss_fn(p):
            loss, (_, metrics) = task.compute_loss(
                p, batch, rng, False, pipeline=pipeline
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads)
        if zero1:
            from mmt_tpu.parallel.zero import constrain_opt_state

            new_state = new_state.replace(
                opt_state=constrain_opt_state(mesh, new_state.opt_state)
            )
        metrics = dict(metrics)
        metrics["total_loss"] = (loss, 1.0)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


class PretrainingTask:
    """MLM + MPP (+ ITM) pretraining."""

    def __init__(self, config: PretrainingTaskConfig, trainer: TrainerConfig):
        self.config = config
        self.trainer = trainer
        data_cfg = config.train_data
        self.model = MmtPretrainingModel(
            config.model,
            mpp_output_num_classes=(2**data_cfg.output_channel_bits) ** 3,
            num_patch_per_row=data_cfg.num_patch_per_row,
        )

    def init(self, rng, batch):
        return self.model.init(rng, **_model_inputs(batch), deterministic=True,
                               mlm_positions=batch.get("mlm_positions"),
                               mpp_positions=batch.get("mpp_positions"))

    def compute_loss(
        self, params, batch, dropout_rng=None, deterministic: bool = False,
        pipeline=None,
    ) -> Tuple[jnp.ndarray, Tuple[Dict, Dict]]:
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        if pipeline is None:
            outputs = self.model.apply(
                params,
                **_model_inputs(batch),
                mlm_positions=batch.get("mlm_positions"),
                mpp_positions=batch.get("mpp_positions"),
                deterministic=deterministic,
                rngs=rngs,
            )
        else:
            outputs = self._pipelined_outputs(
                params, batch, rngs, deterministic, pipeline
            )

        has_itm = "itm_label_weights" in batch and any(
            h.name == "itm" for h in self.config.model.cls_heads
        )
        mlm_w = batch["mlm_label_weights"]
        mpp_w = batch["mpp_label_weights"]
        if has_itm:
            # Mask mlm/mpp on ITM-negative examples.
            itm_ids = batch["itm_label_ids"].astype(jnp.float32)[:, None]
            mlm_w = mlm_w * itm_ids
            mpp_w = mpp_w * itm_ids

        mlm_loss = losses_lib.weighted_sparse_categorical_crossentropy_loss(
            outputs["mlm_logits"], batch["mlm_label_ids"], mlm_w
        )
        mpp_loss = losses_lib.weighted_sparse_categorical_crossentropy_loss(
            outputs["mpp_logits"], batch["mpp_label_ids"], mpp_w
        )
        total = mlm_loss + mpp_loss
        metrics = {
            "mlm_loss": (mlm_loss, 1.0),
            "mpp_loss": (mpp_loss, 1.0),
        }
        if has_itm:
            itm_loss = losses_lib.weighted_sparse_categorical_crossentropy_loss(
                outputs["itm_logits"], batch["itm_label_ids"], batch["itm_label_weights"]
            )
            total = total + itm_loss
            metrics["itm_loss"] = (itm_loss, 1.0)

        metrics.update(self._accuracy_updates(batch, outputs, mlm_w, mpp_w))
        return total, (outputs, metrics)

    def _pipelined_outputs(self, params, batch, rngs, deterministic, pipeline):
        """Model outputs with the encoder layer stack pipelined (see
        ``_pipelined_sequence_output``); MLM/MPP/cls heads run on top."""
        seq_out = _pipelined_sequence_output(
            self.model, self.config.model.encoder.get(), params, batch,
            deterministic, pipeline,
            dropout_rng=(rngs or {}).get("dropout"),
        )
        return self.model.apply(
            params,
            seq_out,
            mlm_positions=batch.get("mlm_positions"),
            mpp_positions=batch.get("mpp_positions"),
            deterministic=deterministic,
            rngs=rngs,
            method="head_outputs",
        )

    def make_pipelined_train_step(
        self, mesh: Mesh, num_micro: int, remat: bool = True,
        zero1: bool = False,
    ):
        """Jitted (state, batch, rng) -> (state, metrics) with the layer
        stack GPipe-pipelined over the mesh's 'pipe' axis (composes with
        'data'); gradients flow through the pipeline into the optimizer
        update.  Hidden + attention dropout run inside the pipeline
        (see ``_pipelined_sequence_output``).
        """
        return _make_pipelined_step(self, mesh, num_micro, remat, zero1)

    def _accuracy_updates(self, batch, outputs, mlm_w, mpp_w):
        upd = {}

        def acc(labels, logits, w):
            correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            return jnp.sum(correct * w), jnp.sum(w)

        upd["mlm_accuracy"] = acc(batch["mlm_label_ids"], outputs["mlm_logits"], mlm_w)
        upd["mpp_accuracy"] = acc(batch["mpp_label_ids"], outputs["mpp_logits"], mpp_w)
        if "itm_label_weights" in batch and "itm_logits" in outputs:
            upd["itm_accuracy"] = acc(
                batch["itm_label_ids"], outputs["itm_logits"], batch["itm_label_weights"]
            )
        return upd

    def make_train_step(self, mesh: Optional[Mesh] = None, micro_batch_size: int = 0,
                        grad_accum_dtype: str = "float32", zero1: bool = False):
        """Returns jitted (state, batch, rng) -> (state, metrics).

        ``micro_batch_size > 0`` enables gradient accumulation: the global
        batch is reshaped to [k, micro, ...] and scanned, summing grads of
        (loss / k) -- the reference's accumulation semantics
        (``src/tasks/pretraining.py:250-298``) with static shapes.
        ``grad_accum_dtype="bfloat16"`` stores the running gradient sum
        in bf16 (half the accumulator HBM; see ``TrainerConfig``).
        ``zero1`` pins ZeRO-1 optimizer-state shardings
        (``mmt_tpu.parallel.zero``; place the state with
        ``shard_opt_state`` first).
        """
        acc_dtype = jnp.dtype(grad_accum_dtype)

        def loss_for_grad(params, micro, rng, k):
            loss, (_, metrics) = self.compute_loss(params, micro, rng, False)
            return loss / k, metrics

        def step(state: TrainState, batch, rng):
            if micro_batch_size:
                bsz = batch["word_ids"].shape[0]
                k = max(1, bsz // micro_batch_size)

                def reshape(x):
                    return x.reshape((k, bsz // k) + x.shape[1:])

                micro_batches = _batch_sharding_constraint(
                    jax.tree.map(reshape, batch), mesh
                )
                rngs = jax.random.split(rng, k)

                def body(carry, xs):
                    grads_acc, loss_acc = carry
                    micro, r = xs
                    (loss, metrics), grads = jax.value_and_grad(
                        loss_for_grad, has_aux=True
                    )(state.params, micro, r, float(k))
                    grads_acc = jax.tree.map(
                        lambda a, g: a + g.astype(acc_dtype), grads_acc, grads
                    )
                    return (grads_acc, loss_acc + loss), metrics

                zero_grads = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, acc_dtype), state.params
                )
                (grads, loss), metrics_stack = jax.lax.scan(
                    body, (zero_grads, jnp.zeros((), jnp.float32)), (micro_batches, rngs)
                )
                grads = jax.tree.map(
                    lambda g, p: g.astype(p.dtype), grads, state.params
                )
                metrics = jax.tree.map(lambda x: jnp.sum(x, 0), metrics_stack)
            else:
                (loss, (_, metrics)), grads = jax.value_and_grad(
                    lambda p: self.compute_loss(p, batch, rng, False), has_aux=True
                )(state.params)
            new_state = state.apply_gradients(grads)
            if zero1 and mesh is not None:
                from mmt_tpu.parallel.zero import constrain_opt_state

                new_state = new_state.replace(
                    opt_state=constrain_opt_state(mesh, new_state.opt_state)
                )
            metrics = dict(metrics)
            metrics["total_loss"] = (loss, 1.0)
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,))

    def make_eval_step(self, mesh: Optional[Mesh] = None):
        def step(params, batch):
            loss, (_, metrics) = self.compute_loss(params, batch, None, True)
            metrics = dict(metrics)
            metrics["total_loss"] = (loss, 1.0)
            return metrics

        if mesh is not None:
            # Multi-host: batches arrive as global arrays (shard_batch);
            # replicate outputs so every process can fetch them.
            return jax.jit(step, out_shardings=NamedSharding(mesh, P()))
        return jax.jit(step)


class ClassificationTask:
    """ITM classification finetune / retrieval scoring."""

    def __init__(self, config: ClassificationTaskConfig, trainer: TrainerConfig):
        self.config = config
        self.trainer = trainer
        data_cfg = config.train_data
        self.model = MmtClassificationModel(
            config.model, num_patch_per_row=data_cfg.num_patch_per_row
        )
        heads = config.model.cls_heads
        self.logits_key = f"{heads[0].name}_logits" if heads else "logits"
        self.num_classes = heads[0].num_classes if heads else config.model.num_classes

    def init(self, rng, batch):
        return self.model.init(rng, **_model_inputs(batch), deterministic=True)

    def compute_loss(self, params, batch, dropout_rng=None, deterministic=False,
                     pipeline=None):
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        if pipeline is None:
            outputs = self.model.apply(
                params, **_model_inputs(batch), deterministic=deterministic,
                rngs=rngs,
            )
        else:
            seq_out = _pipelined_sequence_output(
                self.model, self.config.model.encoder.get(), params, batch,
                deterministic, pipeline,
                dropout_rng=(rngs or {}).get("dropout"),
            )
            outputs = self.model.apply(
                params, seq_out, deterministic=deterministic, rngs=rngs,
                method="head_outputs",
            )
        logits = outputs[self.logits_key]
        labels = batch["label_ids"]
        weights = batch["label_weights"]
        pos_weights = batch.get("pos_weights")

        if self.num_classes == 1:
            loss = losses_lib.weighted_binary_crossentropy_loss(
                logits, labels, weights, pos_weights
            )
        else:
            loss = losses_lib.weighted_sparse_categorical_crossentropy_loss(
                logits, labels, weights, pos_weights
            )
        if self.num_classes == 1:
            # Binary head: one logit per example; accuracy thresholds the
            # sigmoid at 0.5 (argmax over a singleton dim is meaningless).
            pred = (logits.reshape(-1) > 0).astype(labels.dtype)
            correct = (pred == labels).astype(jnp.float32)
        else:
            correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        metrics = {
            "cls_loss": (loss, 1.0),
            "cls_accuracy": (
                jnp.sum(correct * weights),
                jnp.sum(weights.astype(jnp.float32)),
            ),
        }
        return loss, (outputs, metrics)

    def make_train_step(self, mesh: Optional[Mesh] = None, zero1: bool = False):
        def step(state: TrainState, batch, rng):
            (loss, (_, metrics)), grads = jax.value_and_grad(
                lambda p: self.compute_loss(p, batch, rng, False), has_aux=True
            )(state.params)
            new_state = state.apply_gradients(grads)
            if zero1 and mesh is not None:
                from mmt_tpu.parallel.zero import constrain_opt_state

                new_state = new_state.replace(
                    opt_state=constrain_opt_state(mesh, new_state.opt_state)
                )
            metrics = dict(metrics)
            metrics["total_loss"] = (loss, 1.0)
            return new_state, metrics

        return jax.jit(step, donate_argnums=(0,))

    def make_pipelined_train_step(
        self, mesh: Mesh, num_micro: int, remat: bool = True,
        zero1: bool = False,
    ):
        """Finetune step with the encoder stack GPipe-pipelined over the
        mesh's 'pipe' axis."""
        return _make_pipelined_step(self, mesh, num_micro, remat, zero1)

    def make_eval_step(self, mesh: Optional[Mesh] = None):
        def step(params, batch):
            loss, (outputs, metrics) = self.compute_loss(params, batch, None, True)
            metrics = dict(metrics)
            metrics["total_loss"] = (loss, 1.0)
            # Probabilities for host-side AUC-PR.
            logits = outputs[self.logits_key]
            if self.num_classes == 1:
                probs = jax.nn.sigmoid(logits.reshape(-1))
            elif self.num_classes == 2:
                probs = jax.nn.softmax(logits, axis=-1)[:, 1]
            else:
                probs = jnp.argmax(logits, axis=-1).astype(jnp.float32)
            return metrics, probs

        if mesh is not None:
            return jax.jit(step, out_shardings=NamedSharding(mesh, P()))
        return jax.jit(step)

    def make_inference_step(self, mesh=None):
        """Jitted (params, batch) -> scores, with the reference's logit
        conversion (sigmoid / softmax[:,1] / argmax;
        ``src/tasks/classification.py:286-293``).

        With ``mesh``, scoring shards over the 'data' axis (GSPMD): the
        multi-chip analog of the reference's distributed predict
        (``src/tasks/classification.py:302-322``,
        ``orbit.utils.make_distributed_dataset``).  Batches must be
        divisible by the data-axis size; the retrieval loader's padded
        final batch + ``valid`` mask already guarantee static shapes.
        """

        def fwd(params, inputs):
            outputs = self.model.apply(params, **inputs, deterministic=True)
            logits = outputs[self.logits_key]
            if self.num_classes == 1:
                return jax.nn.sigmoid(logits.reshape(-1))
            if self.num_classes == 2:
                return jax.nn.softmax(logits, axis=-1)[:, 1]
            return jnp.argmax(logits, axis=-1).astype(jnp.float32)

        if mesh is None:
            jitted = jax.jit(fwd)

            def step(params, batch):
                return jitted(params, _model_inputs(batch))

            return step

        from jax.sharding import NamedSharding, PartitionSpec

        data = NamedSharding(mesh, PartitionSpec("data"))
        replicated = NamedSharding(mesh, PartitionSpec())
        jitted = jax.jit(fwd, in_shardings=(replicated, data), out_shardings=data)
        n_data = mesh.shape["data"]

        def step(params, batch):
            inputs = _model_inputs(batch)
            b = next(iter(inputs.values())).shape[0]
            if b % n_data:
                raise ValueError(
                    f"predict batch ({b}) must be divisible by the data-axis "
                    f"size ({n_data})"
                )
            params = jax.device_put(params, replicated)
            inputs = {k: jax.device_put(v, data) for k, v in inputs.items()}
            return jitted(params, inputs)

        return step
