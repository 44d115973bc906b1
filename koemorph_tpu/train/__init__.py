"""Training: optax optimizers, trainers, orbax checkpointing."""

from koemorph_tpu.train.optim import create_lr_schedule, create_optimizer
from koemorph_tpu.train.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    load_opt_state,
    save_checkpoint,
)
from koemorph_tpu.train.trainer import (
    DualStreamTrainer,
    KoeMorphTrainer,
    SequentialTrainer,
    Trainer,
    TrainState,
    create_train_state,
    loss_config_from,
    sequence_targets,
)

__all__ = [
    "create_lr_schedule", "create_optimizer",
    "CheckpointManager", "save_checkpoint", "load_checkpoint",
    "load_opt_state",
    "Trainer", "TrainState", "create_train_state",
    "KoeMorphTrainer", "DualStreamTrainer", "SequentialTrainer",
    "loss_config_from", "sequence_targets",
]
