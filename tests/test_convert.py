"""Checkpoint converter round-trip validation (offline, no real weights).

Synthesize the torch-layout state dict from Flax params via the converter's
exact inverse, convert back, and require bitwise-identical trees — this
pins the name mapping and the OIHW→HWIO / (out,in)→(in,out) transposes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.models import UNet2D, ddpm_tiny
from diffusion_pullback_tpu.models.convert import (
    convert_torch_state_dict,
    flax_params_to_torch_state_dict,
)


@pytest.fixture(scope="module")
def tiny_params():
    model = UNet2D(ddpm_tiny(16))
    params = model.init(
        jax.random.key(3), jnp.zeros((1, 16, 16, 3)), jnp.float32(0.0)
    )
    return model, params


def test_round_trip_identity(tiny_params):
    model, params = tiny_params
    sd = flax_params_to_torch_state_dict(params)
    # torch-style names present
    assert any(k.startswith("down_blocks.0.resnets.0.conv1") for k in sd)
    assert "time_embedding.linear_1.weight" in sd
    assert any(".downsamplers.0.weight" in k for k in sd)
    # conv weights are OIHW
    w = sd["conv_in.weight"]
    assert w.shape == (8, 3, 3, 3)  # (out,in,kh,kw)

    back = convert_torch_state_dict(sd, params)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))

    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path)
        )


def test_missing_param_raises(tiny_params):
    _, params = tiny_params
    sd = flax_params_to_torch_state_dict(params)
    sd.pop("conv_in.weight")
    with pytest.raises(KeyError, match="conv_in"):
        convert_torch_state_dict(sd, params)


def test_shape_mismatch_raises(tiny_params):
    _, params = tiny_params
    sd = flax_params_to_torch_state_dict(params)
    sd["conv_in.weight"] = np.zeros((9, 3, 3, 3), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_torch_state_dict(sd, params)


def test_extra_tensor_raises_but_buffers_ignored(tiny_params):
    _, params = tiny_params
    sd = flax_params_to_torch_state_dict(params)
    sd["mid_block.resnets.0.norm1.num_batches_tracked"] = np.zeros((), np.int64)
    convert_torch_state_dict(dict(sd), params)  # buffer ignored
    sd["surprise.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(KeyError, match="unconsumed"):
        convert_torch_state_dict(sd, params)


def test_old_diffusers_attention_names(tiny_params):
    """query/key/value/proj_attn (diffusers 0.11 AttentionBlock) map onto
    to_q/to_k/to_v/to_out."""
    model, params = tiny_params
    sd = flax_params_to_torch_state_dict(params)
    renames = {"to_q": "query", "to_k": "key", "to_v": "value", "to_out": "proj_attn"}
    old_sd = {}
    for k, v in sd.items():
        for new, old in renames.items():
            if f".{new}." in k:
                k = k.replace(f".{new}.", f".{old}.")
                break
        old_sd[k] = v
    assert any(".query." in k for k in old_sd)
    back = convert_torch_state_dict(old_sd, params)
    flat_a = dict(jax.tree_util.tree_leaves_with_path(params))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_a[path]), np.asarray(flat_b[path])
        )


def test_vae_checkpoint_round_trip():
    """The VAE's encoder/decoder scoping + flat stage names must survive the
    torch round trip (regression: 'encoder.' was being stripped and the flat
    down_blocks_i_resnets_j names didn't match the digit-merge)."""
    from diffusion_pullback_tpu.models import AutoencoderKL, vae_tiny

    vae = AutoencoderKL(vae_tiny(16))
    params = vae.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
    sd = flax_params_to_torch_state_dict(params)
    assert any(k.startswith("encoder.down_blocks.0.resnets.0") for k in sd), \
        sorted(sd)[:5]
    assert any(k.startswith("decoder.up_blocks.0.resnets.0") for k in sd)
    back = convert_torch_state_dict(sd, params)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), err_msg=str(path))


def test_adm_conv1d_qkv_weights_convert():
    """ADM checkpoints store attention qkv/proj_out as 1-D convs with
    (out, in, 1) weights; the converter must squeeze+transpose them onto our
    Dense kernels."""
    import dataclasses

    from diffusion_pullback_tpu.models import UNetADM, adm_tiny

    model = UNetADM(adm_tiny(16))
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.float32(0.0))
    sd = flax_params_to_torch_state_dict(params)
    # rewrite every attention qkv/proj_out dense as an ADM-style conv1d
    sd3 = {}
    for k, v in sd.items():
        if (".qkv." in k or ".proj_out." in k) and k.endswith(".weight") \
                and v.ndim == 2:
            sd3[k] = v[:, :, None]  # (out,in) -> (out,in,1)
        else:
            sd3[k] = v
    back = convert_torch_state_dict(sd3, params)
    flat_a = dict(jax.tree_util.tree_leaves_with_path(params))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[path]),
                                      np.asarray(flat_b[path]), err_msg=str(path))


def test_encoder_unet_classifier_round_trip():
    """EncoderUNetADM (the guidance classifier) round-trips, including the
    AttentionPool2d positional embedding's (C, S+1) torch orientation and
    its conv1d qkv/c_proj weights."""
    import numpy as np_

    from diffusion_pullback_tpu.models import EncoderUNetADM, adm_encoder_tiny

    m = EncoderUNetADM(adm_encoder_tiny(16, pool="attention"))
    params = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                    jnp.float32(0.0))
    sd = flax_params_to_torch_state_dict(params)
    pe = next(v for k, v in sd.items() if "positional_embedding" in k)
    c = 16  # tiny config: model_channels 8 × channel_mult[-1] 2
    assert pe.shape[0] == c and pe.shape[1] > pe.shape[0]  # (C, S+1)
    # ADM-era conv1d storage for the pool projections
    sd2 = {}
    for k, v in sd.items():
        if (".qkv_proj." in k or ".c_proj." in k) and k.endswith(".weight") \
                and v.ndim == 2:
            sd2[k] = np_.asarray(v)[:, :, None]   # (out,in) → conv1d (out,in,1)
        else:
            sd2[k] = v
    back = convert_torch_state_dict(sd2, params)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))
