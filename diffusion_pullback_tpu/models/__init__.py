from .adm import (
    ADMTapState,
    AttentionPool2d,
    EncoderUNetADM,
    SuperResUNetADM,
    UNetADM,
)
from .clip_text import CLIPTextModel, HashTokenizer, load_tokenizer
from .configs import (
    ADMConfig,
    ADMEncoderConfig,
    CLIPTextConfig,
    UNet2DConditionConfig,
    UNet2DConfig,
    VAEConfig,
    adm_cifar10,
    adm_classifier,
    adm_classifier_imagenet256,
    adm_encoder_tiny,
    adm_ffhq_p2,
    adm_imagenet64_cond,
    adm_imagenet64_uncond,
    adm_imagenet128_cond,
    adm_imagenet256_cond,
    adm_imagenet256_uncond,
    adm_lsun_256,
    adm_tiny,
    clip_text_tiny,
    ddpm_celebahq_256,
    ddpm_tiny,
    sd15_text_encoder,
    sd15_unet,
    sd21_base_unet,
    sd21_text_encoder,
    sdxl_text_encoder_1,
    sdxl_text_encoder_2,
    sd_tiny_unet,
    sd_vae,
    sdxl_base_unet,
    sdxl_tiny_unet,
    vae_tiny,
)
from .unet2d import TapPoint, TapState, UNet2D
from .unet2d_condition import CondTapState, UNet2DCondition
from .vae import AutoencoderKL

__all__ = [
    "ADMConfig",
    "ADMEncoderConfig",
    "ADMTapState",
    "UNetADM",
    "adm_cifar10",
    "adm_classifier",
    "adm_classifier_imagenet256",
    "adm_encoder_tiny",
    "adm_ffhq_p2",
    "adm_imagenet64_cond",
    "adm_imagenet64_uncond",
    "adm_imagenet128_cond",
    "adm_imagenet256_cond",
    "adm_imagenet256_uncond",
    "adm_lsun_256",
    "adm_tiny",
    "AttentionPool2d",
    "EncoderUNetADM",
    "SuperResUNetADM",
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
    "sdxl_text_encoder_1",
    "sdxl_text_encoder_2",
    "sd_tiny_unet",
    "sd_vae",
    "sdxl_base_unet",
    "sdxl_tiny_unet",
    "vae_tiny",
]


def model_for_name(model_name: str, dtype: str = "float32", precision=None,
                   attn_impl: str = ""):
    """model_name → constructed uncond diffusion module.

    The routing the reference scatters across configs/paths.py:1-19,
    define_argparser.py:163-172 and guided_diffusion/script_util.py:96-257:
    HF '*_HF' names share the google/ddpm 256px architecture (UNet2D);
    checkpoint-era ADM/P2 names build the UNetADM port (learned-σ heads).
    """
    import dataclasses

    from .configs import (
        ddpm_ema_bedroom_256,
        ddpm_ema_church_256,
        ddpm_ema_ffhq_256,
    )

    hf = {
        "CelebA_HQ_HF": ddpm_celebahq_256,
        "LSUN_church_HF": ddpm_ema_church_256,
        "LSUN_bedroom_HF": ddpm_ema_bedroom_256,
        "FFHQ_HF": ddpm_ema_ffhq_256,
    }
    adm = {
        "LSUN_bedroom": adm_lsun_256,
        "LSUN_cat": adm_lsun_256,
        "LSUN_horse": adm_lsun_256,
        "FFHQ_P2": adm_ffhq_p2,
        "AFHQ_P2": adm_ffhq_p2,
        "Flower_P2": adm_ffhq_p2,
        "CIFAR10": adm_cifar10,
        "CIFAR10Uncond": adm_cifar10,
        "ImageNet64Uncond": adm_imagenet64_uncond,
        "ImageNet256Uncond": adm_imagenet256_uncond,
        "ImageNet256Cond": adm_imagenet256_cond,
        "ImageNet128Cond": adm_imagenet128_cond,
        "ImageNet64Cond": adm_imagenet64_cond,
    }
    if model_name in hf:
        cfg = dataclasses.replace(hf[model_name](), dtype=dtype,
                                  precision=precision)
        return UNet2D(cfg)
    if model_name in adm:
        cfg = dataclasses.replace(adm[model_name](), dtype=dtype,
                                  precision=precision)
        if attn_impl:  # sampling-side kernel (UNet2D has no switch; its
            cfg = dataclasses.replace(cfg, attn_impl=attn_impl)  # 256-token
        return UNetADM(cfg)  # attention gains nothing from fused kernels)
    raise ValueError(f"unknown uncond model_name: {model_name!r}")


__all__.append("model_for_name")
