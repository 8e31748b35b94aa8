"""Typed configuration system.

Re-provides the reference's 4-mechanism config surface (TFM dataclass
configs + yaml overrides + string registries + gin injection; SURVEY
section 5) with a single idiomatic mechanism: plain dataclasses with
strict nested override-from-dict/yaml and a string-keyed experiment
registry.
"""

from mmt_tpu.configs.base import Config, override, from_yaml_file, to_dict  # noqa: F401
from mmt_tpu.configs.encoder import MmtEncoderConfig  # noqa: F401
from mmt_tpu.configs.model import (  # noqa: F401
    ClsHeadConfig,
    PretrainModelConfig,
    ClassificationModelConfig,
)
from mmt_tpu.configs.data import (  # noqa: F401
    MmtDataConfig,
    MmtPretrainDataConfig,
    MmtClassificationDataConfig,
    MmtRetrievalDataConfig,
)
from mmt_tpu.configs.optimization import (  # noqa: F401
    OptimizationConfig,
    AdamWConfig,
    PolynomialLrConfig,
    PolynomialWarmupConfig,
)
from mmt_tpu.configs.experiments import (  # noqa: F401
    ExperimentConfig,
    TrainerConfig,
    RuntimeConfig,
    PretrainingTaskConfig,
    ClassificationTaskConfig,
    get_experiment_config,
    register_experiment,
)
