from .cache import BasisCache, basis_name, load_basis
from .edit_sd import EditStableDiffusion, SDExperimentConfig
from .edit_sdxl import EditStableDiffusionXL
from .edit_uncond import EditUncondDiffusion, UncondExperimentConfig

__all__ = [
    "BasisCache",
    "load_basis",
    "basis_name",
    "EditStableDiffusion",
    "SDExperimentConfig",
    "EditStableDiffusionXL",
    "EditUncondDiffusion",
    "UncondExperimentConfig",
]
