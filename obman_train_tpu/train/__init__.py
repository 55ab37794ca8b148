from obman_train_tpu.train.metrics import AverageMeters, EvalUtil
from obman_train_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "AverageMeters",
    "EvalUtil",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
]
