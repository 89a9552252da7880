"""Full-size SD-family converter layouts (VERDICT r2 Missing #1a):
SD-2.1 UNet/VAE/text, SDXL UNet + dual text towers — synthetic state dicts
at the exact released shapes through the converter, asserting bijection and
the layout-distinguishing keys (per-block head-dim lists, SDXL
add_embedding naming, dual towers). No forwards — layouts are
input-resolution-independent, so this is pure mapping validation at scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_pullback_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DCondition,
    sd21_base_unet,
    sd21_text_encoder,
    sd_vae,
    sdxl_base_unet,
    sdxl_text_encoder_1,
    sdxl_text_encoder_2,
)
from diffusion_pullback_tpu.models.convert import (
    CLIP_STRIP_PREFIXES,
    convert_torch_state_dict,
    flax_params_to_torch_state_dict,
)

pytestmark = pytest.mark.slow


def _roundtrip(params, sd=None, strip=("module.",)):
    sd = sd if sd is not None else flax_params_to_torch_state_dict(params)
    back = convert_torch_state_dict(sd, params, strip_prefixes=strip)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path)
        )
    return sd


def _n_params(params):
    return sum(int(np.prod(np.shape(v))) for v in jax.tree.leaves(params))


@pytest.fixture(scope="module")
def sd21_unet_params():
    cfg = sd21_base_unet()
    model = UNet2DCondition(cfg)
    return cfg, model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, cfg.in_channels)),
        jnp.float32(0.0),
        jnp.zeros((1, 77, cfg.cross_attention_dim)),
    )


def test_sd21_unet_layout_and_roundtrip(sd21_unet_params):
    cfg, params = sd21_unet_params
    # released checkpoint scale: stable-diffusion-2-1-base U-Net ≈ 865.9M
    assert abs(_n_params(params) / 1e6 - 865.9) < 2.0
    sd = _roundtrip(params)
    keys = set(sd)
    for k in [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        # cross-attention transformer stack (the layout the tiny tests
        # never reached at depth): self-attn, cross-attn, geglu MLP
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.norm3.weight",
        "down_blocks.0.attentions.0.proj_out.weight",
        "down_blocks.0.downsamplers.0.weight",
        "mid_block.attentions.0.transformer_blocks.0.attn2.to_v.weight",
        "up_blocks.3.attentions.2.proj_out.weight",
        "conv_out.weight",
    ]:
        assert k in keys, k
    # cross-attn k/v consume the 1024-d SD2.1 text context
    kshape = tuple(
        sd["down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"].shape
    )
    assert kshape == (320, 1024)
    # per-block head dims: q projections match the block channel widths
    assert tuple(
        sd["down_blocks.2.attentions.0.transformer_blocks.0.attn1.to_q.weight"].shape
    ) == (1280, 1280)


def test_sdxl_unet_layout_and_roundtrip():
    cfg = sdxl_base_unet()
    model = UNet2DCondition(cfg)
    added = (jnp.zeros((1, cfg.addition_embed_dim)), jnp.zeros((1, 6)))
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.float32(0.0),
        jnp.zeros((1, 77, cfg.cross_attention_dim)), added_cond=added,
    )
    # stabilityai/stable-diffusion-xl-base-1.0 U-Net ≈ 2567M
    assert abs(_n_params(params) / 1e9 - 2.567) < 0.03
    sd = _roundtrip(params)
    keys = set(sd)
    for k in [
        # the SDXL-distinguishing surfaces: addition embeds + 10-deep
        # transformer stacks + 2048-d context
        "add_embedding.linear_1.weight",
        "add_embedding.linear_2.bias",
        "down_blocks.2.attentions.0.transformer_blocks.9.attn1.to_q.weight",
        "mid_block.attentions.0.transformer_blocks.9.ff.net.2.weight",
        "up_blocks.0.attentions.2.transformer_blocks.9.attn2.to_k.weight",
    ]:
        assert k in keys, k
    assert tuple(
        sd["down_blocks.2.attentions.0.transformer_blocks.0.attn2.to_k.weight"].shape
    ) == (1280, 2048)


def test_sd_vae_fullsize_roundtrip():
    vae = AutoencoderKL(sd_vae())
    params = vae.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))
    # SD VAE ≈ 83.65M
    assert abs(_n_params(params) / 1e6 - 83.65) < 1.0
    sd = _roundtrip(params)
    keys = set(sd)
    for k in [
        "encoder.down_blocks.0.resnets.0.conv1.weight",
        "encoder.down_blocks.0.downsamplers.0.weight",
        "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.conv_out.weight",
        "decoder.up_blocks.3.resnets.2.conv2.weight",
        "decoder.conv_out.bias",
        "quant_conv.weight",
        "post_quant_conv.weight",
    ]:
        assert k in keys, k


@pytest.mark.parametrize("tower,expect_hidden", [
    (sd21_text_encoder, 1024),
    (sdxl_text_encoder_1, 768),
    (sdxl_text_encoder_2, 1280),
])
def test_clip_towers_fullsize_roundtrip(tower, expect_hidden):
    """All three released text towers (SD2.1 ViT-H, SDXL ViT-L + bigG)
    round-trip; the HF wrapper scopes (text_model./embeddings./encoder.)
    strip correctly on load."""
    cfg = tower()
    model = CLIPTextModel(cfg)
    params = model.init(
        jax.random.key(2), jnp.zeros((1, cfg.max_length), jnp.int32)
    )
    sd = _roundtrip(params)
    keys = set(sd)
    assert "token_embedding.weight" in keys
    assert f"layers.{cfg.num_layers - 1}.self_attn.q_proj.weight" in keys, \
        sorted(keys)[:8]
    # HF hub layout: re-wrap under the exact transformers scopes
    # (text_model.embeddings.* / text_model.encoder.layers.N.* /
    # text_model.final_layer_norm) and strip on conversion
    def wrap(k):
        if k.startswith("layers."):
            return f"text_model.encoder.{k}"
        if k.startswith("final_layer_norm"):
            return f"text_model.{k}"
        return f"text_model.embeddings.{k}"

    wrapped = {wrap(k): v for k, v in sd.items()}
    # conversion with CLIP prefixes consumes the wrapped form
    back = convert_torch_state_dict(
        wrapped, params, strip_prefixes=CLIP_STRIP_PREFIXES
    )
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path)
        )
    d = next(v for k, v in sd.items() if "token_embedding" in k)
    assert d.shape[-1] == expect_hidden
