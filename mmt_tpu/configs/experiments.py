"""Experiment registry: ``mmt/pretraining``, ``mmt/classification``, ``mmt/retrieval``.

Parity surface: TFM ``exp_factory`` registrations in
``src/configs/pretraining_experiments.py:50-63`` and
``src/configs/finetuning_experiments.py:25-98``, plus the runtime
distribution block (``src/distribute_utils.py``) re-expressed as a mesh
config instead of a strategy-string zoo.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

from mmt_tpu.configs.base import Config
from mmt_tpu.configs.data import (
    MmtClassificationDataConfig,
    MmtPretrainDataConfig,
    MmtRetrievalDataConfig,
)
from mmt_tpu.configs.model import ClassificationModelConfig, PretrainModelConfig
from mmt_tpu.configs.optimization import OptimizationConfig, PolynomialLrConfig


@dataclasses.dataclass
class RuntimeConfig(Config):
    """TPU-native runtime: a device mesh instead of strategy strings.

    The reference's ``runtime.distribution_strategy`` zoo (tpu / mirrored /
    multi_worker_mirrored / one_device / off; ``src/distribute_utils.py``)
    collapses into mesh shape + dtype flags: XLA picks the collectives.
    """

    # Data-parallel mesh axis size; 0 => all visible devices.
    num_data_parallel: int = 0
    # Optional second mesh axis for param/sequence sharding (unused by DP).
    num_model_parallel: int = 1
    # GPipe pipeline stages over a 'pipe' mesh axis (mutually exclusive
    # with num_model_parallel > 1).  Dropout runs inside the pipeline
    # (per-(micro, layer) folded keys).  num_pipeline_microbatches
    # defaults to the gradient-accumulation count (micro_batch_size)
    # for pretraining, 2 for classification.
    num_pipeline_stages: int = 1
    num_pipeline_microbatches: int = 0
    # ZeRO-1: shard Adam moments over the 'data' axis (each chip stores
    # 1/n of the optimizer state; params stay replicated, numerics
    # unchanged).  See mmt_tpu/parallel/zero.py.
    zero_sharded_optimizer: bool = False
    mixed_precision_dtype: str = "bfloat16"
    enable_xla: bool = True  # informational; jax is always XLA


@dataclasses.dataclass
class TrainerConfig(Config):
    """Training-loop knobs (parity: TFM ``cfg.TrainerConfig`` usage in yamls)."""

    train_steps: int = 1000000
    validation_steps: int = -1
    validation_interval: int = 1000
    steps_per_loop: int = 1000
    summary_interval: int = 1000
    checkpoint_interval: int = 1000
    max_to_keep: int = 32
    optimizer_config: OptimizationConfig = dataclasses.field(
        default_factory=OptimizationConfig
    )
    best_checkpoint_export_subdir: str = ""
    best_checkpoint_eval_metric: str = ""
    best_checkpoint_metric_comp: str = "higher"
    # Per-replica micro-batch for gradient accumulation in pretraining
    # (reference BATCH_SIZE_PER_REPLICA=64, src/tasks/pretraining.py:37-39).
    micro_batch_size: int = 64
    # Orbax saves run in a background thread, overlapping checkpoint
    # serialization/IO with the next training window (the loop waits
    # before returning so the final checkpoint is always durable).
    async_checkpointing: bool = True
    # Also write TensorBoard event files (model_dir/summaries/{train,
    # validation}) next to the jsonl summaries.  TF-free encoding
    # (utils/tb_events.py); parity with the reference's TB scalars.
    tensorboard_summaries: bool = True
    # SIGTERM (Cloud TPU's ~30 s preemption notice) triggers one final
    # collective checkpoint save, then the loop raises TrainingPreempted
    # so the launcher can exit cleanly; restart resumes from that exact
    # step instead of losing up to checkpoint_interval steps.
    save_on_preemption: bool = True
    # Accumulator dtype for the scanned gradient sum: "float32" (exact,
    # a params-sized fp32 buffer) or "bfloat16" (halves the accumulator
    # HBM -- headroom for longer sequences / bigger micro-batches; the
    # per-micro-batch gradients are still computed in the model's
    # compute dtype and only the running sum is stored rounded).
    grad_accum_dtype: str = "float32"


@dataclasses.dataclass
class PretrainingTaskConfig(Config):
    """Parity: ``src/tasks/pretraining.py:42-48``."""

    model: PretrainModelConfig = dataclasses.field(default_factory=PretrainModelConfig)
    scale_loss: bool = False
    init_checkpoint: str = ""
    train_data: MmtPretrainDataConfig = dataclasses.field(
        default_factory=MmtPretrainDataConfig
    )
    validation_data: MmtPretrainDataConfig = dataclasses.field(
        default_factory=lambda: MmtPretrainDataConfig(is_training=False)
    )


@dataclasses.dataclass
class ClassificationTaskConfig(Config):
    """Parity: ``src/tasks/classification.py:40-52``."""

    model: ClassificationModelConfig = dataclasses.field(
        default_factory=ClassificationModelConfig
    )
    init_checkpoint: str = ""
    init_cls_pooler: bool = False
    metric_type: str = "accuracy"  # or "auc"
    label_field: str = "label_ids"
    label_weights_field: str = "label_weights"
    logits_field: str = "logits"
    pos_weights_field: str = "pos_weights"
    train_data: MmtClassificationDataConfig = dataclasses.field(
        default_factory=MmtClassificationDataConfig
    )
    validation_data: MmtClassificationDataConfig = dataclasses.field(
        default_factory=lambda: MmtClassificationDataConfig(is_training=False)
    )


@dataclasses.dataclass
class ExperimentConfig(Config):
    task: Config = dataclasses.field(default_factory=PretrainingTaskConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)


_EXPERIMENT_REGISTRY: Dict[str, Callable[[], ExperimentConfig]] = {}


def register_experiment(name: str, factory: Optional[Callable] = None):
    def deco(fn):
        _EXPERIMENT_REGISTRY[name] = fn
        return fn

    return deco(factory) if factory else deco


def get_experiment_config(name: str) -> ExperimentConfig:
    if name not in _EXPERIMENT_REGISTRY:
        raise KeyError(
            f"Unknown experiment {name!r}; known: {sorted(_EXPERIMENT_REGISTRY)}"
        )
    return _EXPERIMENT_REGISTRY[name]()


@register_experiment("mmt/pretraining")
def mmt_pretraining() -> ExperimentConfig:
    """Parity: ``src/configs/pretraining_experiments.py:50-63``."""
    cfg = ExperimentConfig(task=PretrainingTaskConfig())
    cfg.trainer.optimizer_config.polynomial.initial_learning_rate = 1e-4
    return cfg


@register_experiment("mmt/classification")
def mmt_classification() -> ExperimentConfig:
    """Parity: ``src/configs/finetuning_experiments.py:25-60``."""
    cfg = ExperimentConfig(task=ClassificationTaskConfig())
    cfg.trainer.optimizer_config.polynomial = PolynomialLrConfig(
        initial_learning_rate=3e-5
    )
    return cfg


@register_experiment("mmt/retrieval")
def mmt_retrieval() -> ExperimentConfig:
    """Parity: ``src/configs/finetuning_experiments.py:63-98``."""
    cfg = ExperimentConfig(
        task=ClassificationTaskConfig(
            train_data=MmtRetrievalDataConfig(is_training=True),
            validation_data=MmtRetrievalDataConfig(is_training=False),
        )
    )
    cfg.trainer.optimizer_config.polynomial = PolynomialLrConfig(
        initial_learning_rate=3e-5
    )
    return cfg
