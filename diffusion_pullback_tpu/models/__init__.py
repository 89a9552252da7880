from .configs import UNet2DConfig, ddpm_celebahq_256, ddpm_tiny
from .unet2d import TapPoint, UNet2D

__all__ = [
    "UNet2D",
    "UNet2DConfig",
    "TapPoint",
    "ddpm_celebahq_256",
    "ddpm_tiny",
]
