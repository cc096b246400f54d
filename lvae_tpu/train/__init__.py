"""Training framework: state, steps, trainer loop, checkpointing, logging."""

from lvae_tpu.train.checkpoint import CheckpointManager, load_config_dict, save_config
from lvae_tpu.train.init import data_dependent_init
from lvae_tpu.train.logging import MetricLogger
from lvae_tpu.train.state import (
    LossConfig,
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from lvae_tpu.train.trainer import Experiment, Trainer, make_loss_config, make_model

__all__ = [
    "CheckpointManager",
    "load_config_dict",
    "save_config",
    "data_dependent_init",
    "MetricLogger",
    "LossConfig",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "Experiment",
    "Trainer",
    "make_loss_config",
    "make_model",
]
