from .ddim_loop import (
    ddim_scan,
    ddim_invert,
    ddim_forward,
    ddpm_forward,
    performance_boost_etas,
)
from .guidance import (
    classifier_grad_fn,
    condition_eps,
    condition_mean,
    guided_eps_fn,
    x_space_guidance_scan,
)

__all__ = [
    "ddim_scan",
    "ddim_invert",
    "ddim_forward",
    "ddpm_forward",
    "performance_boost_etas",
    "x_space_guidance_scan",
    "classifier_grad_fn",
    "condition_eps",
    "condition_mean",
    "guided_eps_fn",
]
