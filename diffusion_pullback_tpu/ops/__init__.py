from .schedule import (
    DiffusionSchedule,
    TimestepGrid,
    alpha_bar,
    ddim_timestep_grid,
    respaced_betas,
    respaced_timestep_grid,
    space_timesteps,
)
from .ddim import ddim_step, ddpm_step_learned_sigma, predict_x0, split_learned_sigma

__all__ = [
    "DiffusionSchedule",
    "TimestepGrid",
    "alpha_bar",
    "ddim_timestep_grid",
    "respaced_betas",
    "respaced_timestep_grid",
    "space_timesteps",
    "ddim_step",
    "ddpm_step_learned_sigma",
    "split_learned_sigma",
    "predict_x0",
]
