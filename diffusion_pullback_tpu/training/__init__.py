from .train import TrainState, create_train_state, make_train_step
from .resample import (
    LossAwareState,
    init_loss_aware,
    loss_aware_sample_t,
    loss_aware_weights,
    uniform_sample_t,
    update_loss_aware,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "LossAwareState",
    "init_loss_aware",
    "loss_aware_sample_t",
    "loss_aware_weights",
    "uniform_sample_t",
    "update_loss_aware",
]
