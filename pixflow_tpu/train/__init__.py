from .lars import lars_sgd, sgd, frozen_momentum_branch_mask
from .schedule import warmup_cosine, warmup_multistep, make_lr_schedule
from .state import TrainState, create_train_state
from .train_step import make_train_step

__all__ = [
    "lars_sgd", "sgd", "frozen_momentum_branch_mask",
    "warmup_cosine", "warmup_multistep", "make_lr_schedule",
    "TrainState", "create_train_state",
    "make_train_step",
]
