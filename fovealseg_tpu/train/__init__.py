from fovealseg_tpu.train.optim import create_optimizer, make_stage_schedules
from fovealseg_tpu.train.step import LossConfig, TrainState, init_state, make_eval_step, make_train_step

__all__ = [
    "create_optimizer",
    "make_stage_schedules",
    "LossConfig",
    "TrainState",
    "init_state",
    "make_eval_step",
    "make_train_step",
]
