"""Model architecture configs and presets.

Presets mirror the checkpoint families the reference targets
(/root/reference/src/utils/utils.py:56-111: google/ddpm-ema-* HF models, the
SDEdit CelebA-HQ custom DDPM, guided/improved-diffusion nets) so converted
weights drop straight in, while tiny variants keep CI fast.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    """Unconditional 2-D U-Net (DDPM family).

    ``down_block_types`` entries: 'down' | 'attn_down'; up: 'up' | 'attn_up'.
    ``attention_head_dim=None`` → single attention head over all channels.
    """

    sample_size: int = 256
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    down_block_types: Tuple[str, ...] = (
        "down", "down", "down", "down", "attn_down", "down",
    )
    up_block_types: Tuple[str, ...] = (
        "up", "attn_up", "up", "up", "up", "up",
    )
    layers_per_block: int = 2
    attention_head_dim: Optional[int] = None
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    dropout: float = 0.0
    time_embed_dim: Optional[int] = None  # default: 4 * block_out_channels[0]
    flip_sin_to_cos: bool = False
    freq_shift: float = 1.0
    add_mid_attention: bool = True
    asymmetric_downsample: bool = False
    learn_sigma: bool = False  # doubles out_channels at the head
    # computation dtype ('float32' | 'bfloat16') and matmul precision
    # (None = backend default, 'highest' = full f32 passes — use for the
    # pullback/parity paths; on TPU the default runs bf16 matmul passes)
    dtype: str = "float32"
    precision: Optional[str] = None

    @property
    def effective_out_channels(self) -> int:
        return self.out_channels * (2 if self.learn_sigma else 1)


def ddpm_celebahq_256() -> UNet2DConfig:
    """Architecture of google/ddpm-ema-celebahq-256 (and the other google/ddpm
    256px checkpoints the reference loads via CelebA_HQ_HF / LSUN_*_HF)."""
    return UNet2DConfig()


def ddpm_ema_church_256() -> UNet2DConfig:
    return UNet2DConfig()


def ddpm_ema_bedroom_256() -> UNet2DConfig:
    """google/ddpm-ema-bedroom-256 — same arch family as celebahq."""
    return UNet2DConfig()


def ddpm_ema_ffhq_256() -> UNet2DConfig:
    """FFHQ 256px HF checkpoint (reference FFHQ_HF name, paths.py)."""
    return UNet2DConfig()


def sdedit_celeba_256() -> UNet2DConfig:
    """The SDEdit CelebA-HQ custom DDPM (reference src/configs/custom_celeba_ddpm.yml:
    ch=128, ch_mult=(1,1,2,2,4,4), attn at 16x16, two res blocks)."""
    return UNet2DConfig(asymmetric_downsample=True)


def ddpm_tiny(sample_size: int = 32) -> UNet2DConfig:
    """Tiny config for tests: 2 blocks, 8/16 channels, attention in block 1."""
    return UNet2DConfig(
        sample_size=sample_size,
        block_out_channels=(8, 16),
        down_block_types=("down", "attn_down"),
        up_block_types=("attn_up", "up"),
        layers_per_block=1,
        norm_num_groups=4,
    )


@dataclasses.dataclass(frozen=True)
class UNet2DConditionConfig:
    """Text-conditioned U-Net (Stable Diffusion family).

    ``down_block_types`` entries: 'cross' | 'down'; up: 'cross' | 'up'.
    ``attention_heads`` is per-block (SD2.1: ch/64 heads of dim 64; SD1.5:
    8 heads everywhere); ``transformer_depth`` per-block (SDXL uses 2/10).
    """

    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = ("cross", "cross", "cross", "down")
    up_block_types: Tuple[str, ...] = ("up", "cross", "cross", "cross")
    layers_per_block: int = 2
    attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    # per-block head dim; an int applies to every block (SD2.x/SDXL use a
    # constant 64; SD1.5 fixes heads=8 so head_dim scales with channels)
    attention_head_dim: Any = 64
    transformer_depth: Tuple[int, ...] = (1, 1, 1, 1)
    cross_attention_dim: int = 1024
    use_linear_projection: bool = True
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    dropout: float = 0.0
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    # SDXL addition embeddings: pooled text (text_embeds) + micro-conds
    # (time_ids) folded into the time embedding
    addition_embed_dim: Optional[int] = None       # pooled-text dim (1280)
    addition_time_embed_dim: Optional[int] = None  # per-time_id fourier dim (256)
    num_time_ids: int = 6
    remat_transformer: bool = False  # checkpoint transformer blocks (SDXL)
    dtype: str = "float32"
    precision: Optional[str] = None
    attn_impl: str = "xla"
    # fuse the q/k/v projections into one MXU dot (models/layers.project_qkv);
    # set False under a tp mesh so column-sharded kernels stay unconcatenated
    fuse_qkv: bool = True


def sd21_base_unet(**over) -> UNet2DConditionConfig:
    """stabilityai/stable-diffusion-2-1-base U-Net (the reference's scripted
    model, src/scripts/main_various_local_encoder_pullback_*.sh)."""
    return UNet2DConditionConfig(**over)


def sd15_unet(**over) -> UNet2DConditionConfig:
    """runwayml/stable-diffusion-v1-5 U-Net: 8 heads per block (so head_dim
    scales with the block channels), conv projections, CLIP-L context."""
    return UNet2DConditionConfig(
        attention_heads=(8, 8, 8, 8),
        attention_head_dim=(40, 80, 160, 160),  # ch/8 per block
        cross_attention_dim=768,
        use_linear_projection=False,
        **over,
    )


def sdxl_base_unet(**over) -> UNet2DConditionConfig:
    """stabilityai/stable-diffusion-xl-base-1.0 U-Net: 3 levels, transformer
    depths (1,2,10), 2048-d context, pooled-text + time_ids addition embeds
    (BASELINE config 5 target)."""
    return UNet2DConditionConfig(
        sample_size=128,
        block_out_channels=(320, 640, 1280),
        down_block_types=("down", "cross", "cross"),
        up_block_types=("cross", "cross", "up"),
        attention_heads=(5, 10, 20),
        transformer_depth=(1, 2, 10),
        cross_attention_dim=2048,
        addition_embed_dim=1280,
        addition_time_embed_dim=256,
        **over,
    )


def sdxl_tiny_unet(sample_size: int = 8) -> UNet2DConditionConfig:
    """Tiny SDXL-style config (addition embeds + deep transformer) for tests."""
    return UNet2DConditionConfig(
        sample_size=sample_size,
        block_out_channels=(8, 16),
        down_block_types=("down", "cross"),
        up_block_types=("cross", "up"),
        layers_per_block=1,
        attention_heads=(2, 2),
        attention_head_dim=4,
        transformer_depth=(1, 2),
        cross_attention_dim=16,
        addition_embed_dim=8,
        addition_time_embed_dim=4,
        norm_num_groups=4,
    )


def sd_tiny_unet(sample_size: int = 8) -> UNet2DConditionConfig:
    """Tiny SD-style config for tests."""
    return UNet2DConditionConfig(
        sample_size=sample_size,
        block_out_channels=(8, 16),
        down_block_types=("cross", "down"),
        up_block_types=("up", "cross"),
        layers_per_block=1,
        attention_heads=(2, 2),
        attention_head_dim=4,
        transformer_depth=(1, 1),
        cross_attention_dim=16,
        norm_num_groups=4,
    )


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL (SD latent VAE)."""

    sample_size: int = 512
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    attn_impl: str = "xla"  # 'flash' pays off at 512px (4096-token mid attn)
    dtype: str = "float32"
    precision: Optional[str] = None


def sd_vae(**over) -> VAEConfig:
    return VAEConfig(**over)


def vae_tiny(sample_size: int = 32) -> VAEConfig:
    return VAEConfig(
        sample_size=sample_size,
        block_out_channels=(8, 16),
        layers_per_block=1,
        norm_num_groups=4,
        latent_channels=4,
    )


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP/OpenCLIP text encoder (SD prompt embedder)."""

    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 23
    num_heads: int = 16
    max_length: int = 77
    hidden_act: str = "gelu"
    eos_token_id: int = 49407
    dtype: str = "float32"
    precision: Optional[str] = None


def sd21_text_encoder() -> CLIPTextConfig:
    """OpenCLIP ViT-H/14 text tower as shipped with SD2.1 (23 transformer
    layers — the checkpoint is already truncated to the penultimate layer)."""
    return CLIPTextConfig()


def sd15_text_encoder() -> CLIPTextConfig:
    return CLIPTextConfig(
        hidden_size=768, intermediate_size=3072, num_layers=12, num_heads=12,
        hidden_act="quick_gelu",
    )


def sdxl_text_encoder_1() -> CLIPTextConfig:
    """SDXL's first tower: CLIP ViT-L/14 (the SD1.x tower; SDXL consumes its
    penultimate hidden states)."""
    return CLIPTextConfig(
        hidden_size=768, intermediate_size=3072, num_layers=12, num_heads=12,
        hidden_act="quick_gelu",
    )


def sdxl_text_encoder_2() -> CLIPTextConfig:
    """SDXL's second tower: OpenCLIP ViT-bigG/14 (penultimate hidden states
    + the pooled/projected text embedding for the addition-embeds path)."""
    return CLIPTextConfig(
        hidden_size=1280, intermediate_size=5120, num_layers=32, num_heads=20,
        hidden_act="gelu",
    )


def clip_text_tiny() -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=128, hidden_size=16, intermediate_size=32,
        num_layers=2, num_heads=2, max_length=8, eos_token_id=1,
    )


@dataclasses.dataclass(frozen=True)
class ADMConfig:
    """ADM / guided-diffusion U-Net (reference src/models/guided_diffusion).

    Factory presets mirror the per-dataset dicts of the reference's g_DDPM
    factory (src/models/guided_diffusion/script_util.py:96-257).

    ``attention_resolutions`` holds DOWNSAMPLE FACTORS (1, 2, 4, …), the
    semantics of the torch ``UNetModel(attention_resolutions=...)`` argument
    itself — NOT the "32,16,8" resolution strings of the script_util dicts,
    which create_model converts via ``image_size // res``
    (guided_diffusion/script_util.py:413-415). At 256px the published
    "32,16,8" set maps to ds {8,16,32} — the same numbers — which hid this
    distinction until the 32/64px presets (oracle-tested in
    tests/test_iddpm_oracle.py).
    """

    image_size: int = 256
    in_channels: int = 3
    out_channels: int = 3
    model_channels: int = 256
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    attention_resolutions: Tuple[int, ...] = (32, 16, 8)
    num_heads: int = 4
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    learn_sigma: bool = True
    num_classes: Optional[int] = None
    dropout: float = 0.0
    norm_num_groups: int = 32
    zero_init: bool = True  # ADM zero-modules (checkpoint parity)
    dtype: str = "float32"
    precision: Optional[str] = None
    attn_impl: str = "xla"
    # Sinusoidal feature convention. 'adm' = guided_diffusion/improved_
    # diffusion nn.timestep_embedding ([cos,sin], freqs / half). 'ddpm' =
    # the Fairseq/DDPM convention of the improved_ddpm_old stack
    # ([sin,cos], freqs / (half-1), improved_ddpm_old/nn.py:123-144) —
    # its ONLY behavioral difference from guided_diffusion's UNetModel.
    time_embed_style: str = "adm"
    # qkv checkpoint layout: QKVAttention vs Legacy
    # (guided_diffusion/unet.py:258-275); True for the ImageNet64Cond /
    # 512px checkpoints
    use_new_attention_order: bool = False


@dataclasses.dataclass(frozen=True)
class ADMEncoderConfig:
    """Half-U-Net classifier (reference EncoderUNetModel, guided_diffusion/
    unet.py:801-1012): the down path + middle of an ADM U-Net with a pooled
    classification head. Defaults = the published ImageNet classifier
    (script_util.py classifier_defaults: width 128, depth 2, attention at
    32/16/8, scale-shift norm, resblock up/down, attention pool)."""

    image_size: int = 256
    in_channels: int = 3
    out_channels: int = 1000           # class count
    model_channels: int = 128
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    attention_resolutions: Tuple[int, ...] = (32, 16, 8)
    num_heads: int = 4
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    pool: str = "attention"            # adaptive | attention | spatial | spatial_v2
    dropout: float = 0.0
    norm_num_groups: int = 32
    zero_init: bool = True
    dtype: str = "float32"
    precision: Optional[str] = None
    attn_impl: str = "xla"


def adm_classifier_imagenet256() -> ADMEncoderConfig:
    return ADMEncoderConfig()


def adm_classifier(image_size: int = 256, *, width: int = 128,
                   depth: int = 2,
                   attn_res: Tuple[int, ...] = (32, 16, 8),
                   pool: str = "attention") -> ADMEncoderConfig:
    """Published guidance-classifier architecture at a given resolution
    (reference create_classifier, script_util.py:479-517): channel_mult
    switches on image_size and attention sits at downsample factors
    image_size // res — both vary with size, so a 256px config must not be
    reused verbatim at 64/128/512px."""
    mults = {
        512: (0.5, 1, 1, 2, 2, 4, 4),
        256: (1, 1, 2, 2, 4, 4),
        128: (1, 1, 2, 3, 4),
        64: (1, 2, 3, 4),
    }
    if image_size not in mults:
        raise ValueError(f"unsupported classifier image size: {image_size}")
    return ADMEncoderConfig(
        image_size=image_size, model_channels=width, num_res_blocks=depth,
        channel_mult=mults[image_size],
        attention_resolutions=tuple(image_size // r for r in attn_res),
        pool=pool,
    )


def adm_encoder_tiny(image_size: int = 16, pool: str = "attention"
                     ) -> ADMEncoderConfig:
    return ADMEncoderConfig(
        image_size=image_size, out_channels=10, model_channels=8,
        num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(2,),
        num_heads=2, num_head_channels=4, norm_num_groups=4, pool=pool,
    )


def adm_imagenet256_uncond() -> ADMConfig:
    return ADMConfig()


def adm_imagenet256_cond() -> ADMConfig:
    return ADMConfig(num_classes=1000)


def adm_imagenet128_cond() -> ADMConfig:
    """ImageNet128Cond (IMAGENET_128_COND_DICT,
    guided_diffusion/script_util.py:86-110): 128px, channels 256, 2 res
    blocks, 4 heads (no head_channels), attention at res 32/16/8 →
    ds (4, 8, 16), channel_mult (1,1,2,3,4)."""
    return ADMConfig(image_size=128, channel_mult=(1, 1, 2, 3, 4),
                     attention_resolutions=(4, 8, 16), num_heads=4,
                     num_head_channels=-1, num_classes=1000)


def adm_imagenet64_cond() -> ADMConfig:
    """ImageNet64Cond (IMAGENET_64_COND_DICT, script_util.py:112-138):
    64px, channels 192, 3 res blocks, head_channels 64, attention at res
    32/16/8 → ds (2, 4, 8), channel_mult (1,2,3,4), NEW qkv attention
    order (oracle-tested in tests/test_iddpm_oracle.py)."""
    return ADMConfig(image_size=64, model_channels=192, num_res_blocks=3,
                     channel_mult=(1, 2, 3, 4), attention_resolutions=(2, 4, 8),
                     num_classes=1000, use_new_attention_order=True)


def adm_lsun_256() -> ADMConfig:
    """LSUN bedroom/cat/horse 256px (reference LSUN_DICT,
    guided_diffusion/script_util.py:140-163): channels 256, 2 res blocks,
    attention at res 32/16/8 → ds (8, 16, 32), head_channels 64,
    scale-shift norm, resblock up/down — i.e. the ADMConfig defaults."""
    return ADMConfig(attention_resolutions=(8, 16, 32))


def adm_ffhq_p2() -> ADMConfig:
    """P2-weighting FFHQ/AFHQ/Flower 256px checkpoints (reference
    FFHQ_P2/AFHQ_P2/Flower_P2 names, P2_DICT at
    guided_diffusion/script_util.py:165-188 ≡ improved_ddpm_old AFHQ_DICT at
    improved_ddpm_old/script_util.py:3-20): channels 128, 1 res block,
    attention at res 16 → ds (16,), head_channels 64, scale-shift norm,
    resblock up/down. Oracle-tested against the EXECUTED improved_ddpm_old
    factory in tests/test_iddpm_oracle.py."""
    return ADMConfig(model_channels=128, num_res_blocks=1,
                     channel_mult=(1, 1, 2, 2, 4, 4),
                     attention_resolutions=(16,), num_head_channels=64,
                     resblock_updown=True, use_scale_shift_norm=True)


def adm_cifar10() -> ADMConfig:
    """CIFAR10Uncond (reference CIFAR10_32_UNCOND_DICT + guided_diffusion
    model defaults, script_util.py:211-233 + 291-311): 32px, channels 128,
    3 res blocks, attention at res 16/8 → ds (2, 4), 4 heads (no
    head_channels), scale-shift norm, NO resblock up/down."""
    return ADMConfig(image_size=32, model_channels=128, num_res_blocks=3,
                     channel_mult=(1, 2, 2, 2), attention_resolutions=(2, 4),
                     num_heads=4, num_head_channels=-1,
                     resblock_updown=False)


def adm_imagenet64_uncond() -> ADMConfig:
    """ImageNet64Uncond (reference IMAGENET_64_UNCOND_DICT + defaults,
    guided_diffusion/script_util.py:190-209; the improved_diffusion i_DDPM
    route builds the value-identical model from its own dicts,
    improved_diffusion/script_util.py:10-30): 64px, channels 128, 3 res
    blocks, attention at res 16/8 → ds (4, 8), 4 heads, scale-shift norm,
    NO resblock up/down. Oracle-tested against the EXECUTED
    improved_diffusion factory in tests/test_iddpm_oracle.py."""
    return ADMConfig(image_size=64, model_channels=128, num_res_blocks=3,
                     channel_mult=(1, 2, 3, 4), attention_resolutions=(4, 8),
                     num_heads=4, num_head_channels=-1,
                     resblock_updown=False)


def adm_tiny(image_size: int = 16) -> ADMConfig:
    return ADMConfig(
        image_size=image_size, model_channels=8, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_heads=2,
        num_head_channels=-1, norm_num_groups=4, learn_sigma=True,
    )
