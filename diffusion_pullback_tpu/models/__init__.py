from .clip_text import CLIPTextModel, HashTokenizer, load_tokenizer
from .configs import (
    CLIPTextConfig,
    UNet2DConditionConfig,
    UNet2DConfig,
    VAEConfig,
    clip_text_tiny,
    ddpm_celebahq_256,
    ddpm_tiny,
    sd15_text_encoder,
    sd15_unet,
    sd21_base_unet,
    sd21_text_encoder,
    sd_tiny_unet,
    sd_vae,
    vae_tiny,
)
from .unet2d import TapPoint, TapState, UNet2D
from .unet2d_condition import CondTapState, UNet2DCondition
from .vae import AutoencoderKL

__all__ = [
    "AutoencoderKL",
    "CLIPTextConfig",
    "CLIPTextModel",
    "CondTapState",
    "HashTokenizer",
    "TapPoint",
    "TapState",
    "UNet2D",
    "UNet2DConfig",
    "UNet2DCondition",
    "UNet2DConditionConfig",
    "VAEConfig",
    "clip_text_tiny",
    "ddpm_celebahq_256",
    "ddpm_tiny",
    "load_tokenizer",
    "sd15_text_encoder",
    "sd15_unet",
    "sd21_base_unet",
    "sd21_text_encoder",
    "sd_tiny_unet",
    "sd_vae",
    "vae_tiny",
]
