"""Training stack: optimizer, losses, metrics, train state, tasks, loop."""

from mmt_tpu.train.optimizer import create_optimizer, create_learning_rate_fn  # noqa: F401
from mmt_tpu.train.losses import weighted_sparse_categorical_crossentropy_loss  # noqa: F401
from mmt_tpu.train.train_state import TrainState  # noqa: F401
