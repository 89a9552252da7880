from .schedule import (
    DiffusionSchedule,
    TimestepGrid,
    alpha_bar,
    ddim_timestep_grid,
)
from .ddim import ddim_step, ddpm_step_learned_sigma, predict_x0, split_learned_sigma

__all__ = [
    "DiffusionSchedule",
    "TimestepGrid",
    "alpha_bar",
    "ddim_timestep_grid",
    "ddim_step",
    "ddpm_step_learned_sigma",
    "split_learned_sigma",
    "predict_x0",
]
