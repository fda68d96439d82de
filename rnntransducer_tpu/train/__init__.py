from rnntransducer_tpu.train.checkpoint import (
    CheckpointManager, average_checkpoint_params, load_config,
    load_decode_params,
)
from rnntransducer_tpu.train.loop import Trainer
from rnntransducer_tpu.train.metrics import char_error_rate, word_error_rate
from rnntransducer_tpu.train.optim import (make_optimizer, make_schedule,
                                           onecycle_schedule)
from rnntransducer_tpu.train.state import (
    TrainState, build_model, eval_step, learning_rate_at, train_step,
)

__all__ = [
    "CheckpointManager", "load_config", "load_decode_params", "Trainer",
    "char_error_rate",
    "word_error_rate", "make_optimizer", "make_schedule", "onecycle_schedule", "TrainState",
    "build_model", "eval_step", "learning_rate_at", "train_step",
]
