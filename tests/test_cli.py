"""CLI surface tests: flag parity, preset derivations, and a tiny main() run."""

import os

import jax
import pytest

from diffusion_pullback_tpu.utils.config import parse_args, preset


def _base_argv(tmp_path, **over):
    d = {
        "--note": "test",
        "--model_name": "CelebA_HQ_HF",
        "--dataset_name": "noise",
        "--result_folder": str(tmp_path),
        "--for_steps": "100",
        "--performance_boosting_t": "0.2",
    }
    d.update(over)
    argv = []
    for k, v in d.items():
        argv += [k, v]
    return argv


def test_preset_uncond_derivations(tmp_path):
    args = preset(parse_args(_base_argv(tmp_path)))
    assert not args.is_stable_diffusion
    assert (args.c_in, args.image_size, args.memory_bound) == (3, 256, 50)
    assert args.noise_schedule == "linear"
    assert os.path.isdir(args.result_folder)
    assert os.path.isdir(args.obs_folder)
    assert args.exp == "CelebA_HQ_HF-noise-test"


def test_preset_sd_derivations(tmp_path):
    args = preset(
        parse_args(
            _base_argv(
                tmp_path,
                **{
                    "--model_name": "stabilityai/stable-diffusion-2-1-base",
                    "--performance_boosting_t": "0.0",
                },
            )
        )
    )
    assert args.is_stable_diffusion
    assert (args.c_in, args.image_size, args.memory_bound) == (4, 64, 5)


def test_preset_scale_table(tmp_path):
    args = preset(
        parse_args(
            _base_argv(
                tmp_path,
                **{"--use_x_space_guidance": "True", "--h_t": "0.6"},
            )
        )
    )
    assert args.x_space_guidance_scale == 4  # uncond table at 0.6


def test_preset_asserts(tmp_path):
    with pytest.raises(AssertionError):
        preset(parse_args(_base_argv(tmp_path, **{"--for_steps": "50"})))
    with pytest.raises(AssertionError):
        preset(
            parse_args(_base_argv(tmp_path, **{"--performance_boosting_t": "0"}))
        )


def test_unknown_model_raises(tmp_path):
    with pytest.raises(ValueError, match="model_name choice"):
        preset(parse_args(_base_argv(tmp_path, **{"--model_name": "WAT"})))


def test_dtype_auto_resolution(tmp_path):
    """'' resolves per backend (fp32 on the CPU test platform, bf16 on
    accelerators); explicit values pass through; junk is rejected."""
    args = preset(parse_args(_base_argv(tmp_path)))
    assert args.dtype == "fp32"  # conftest forces the cpu platform
    args = preset(parse_args(_base_argv(tmp_path, **{"--dtype": "bf16"})))
    assert args.dtype == "bf16"
    with pytest.raises(ValueError, match="dtype"):
        preset(parse_args(_base_argv(tmp_path, **{"--dtype": "f64"})))


def test_weights_dtype_resolution(tmp_path):
    """'auto' follows the resolved --dtype; explicit values decouple
    parameter storage from compute dtype; junk is rejected."""
    args = preset(parse_args(_base_argv(tmp_path)))
    assert args.weights_dtype == args.dtype == "fp32"
    args = preset(parse_args(_base_argv(tmp_path, **{"--dtype": "bf16"})))
    assert args.weights_dtype == "bf16"
    args = preset(parse_args(_base_argv(
        tmp_path, **{"--dtype": "bf16", "--weights_dtype": "fp32"})))
    assert args.dtype == "bf16" and args.weights_dtype == "fp32"
    with pytest.raises(ValueError, match="weights_dtype"):
        preset(parse_args(_base_argv(tmp_path, **{"--weights_dtype": "f64"})))


def test_weights_dtype_casts_params(tmp_path):
    """--weights_dtype bf16 stores the diffusion-model parameters in
    bfloat16 (halved HBM weight traffic) without touching compute dtype."""
    import jax.numpy as jnp

    from main import build_uncond

    args = preset(parse_args(_base_argv(tmp_path, **{
        "--weights_dtype": "bf16", "--pca_rank": "2"})))
    drv = build_uncond(args)
    leaves = jax.tree.leaves(drv.params)
    assert all(a.dtype == jnp.bfloat16 for a in leaves
               if jnp.issubdtype(a.dtype, jnp.floating))


def test_weights_dtype_sd_casts_unet_only(tmp_path, monkeypatch):
    """SD family: the cast hits the per-step UNet but not the once-per-edit
    VAE/text encoder (tiny configs stand in for the 866M real ones)."""
    import jax.numpy as jnp

    import main as cli
    from diffusion_pullback_tpu import models
    from diffusion_pullback_tpu.models import configs as C

    monkeypatch.setattr(models, "sd21_base_unet", lambda: C.sd_tiny_unet())
    monkeypatch.setattr(models, "sd_vae",
                        lambda attn_impl="": C.vae_tiny(sample_size=16))
    monkeypatch.setattr(models, "sd21_text_encoder",
                        lambda: C.clip_text_tiny())
    args = preset(parse_args(_base_argv(tmp_path, **{
        "--model_name": "stabilityai/stable-diffusion-2-1-base",
        "--performance_boosting_t": "0.0",
        "--weights_dtype": "bf16", "--pca_rank": "2"})))
    args.image_size = 2  # tiny: x0 for the VAE init is image_size*8 px
    drv = cli.build_sd(args)
    f = lambda t: {a.dtype for a in jax.tree.leaves(t)
                   if jnp.issubdtype(a.dtype, jnp.floating)}
    assert f(drv.unet_params) == {jnp.dtype(jnp.bfloat16)}
    assert f(drv.vae_params) == {jnp.dtype(jnp.float32)}
    assert f(drv.text_params) == {jnp.dtype(jnp.float32)}


def test_loop_impl_auto_resolution(tmp_path):
    """'auto' resolves to 'scan' everywhere on the CPU test platform (the
    SDXL single-chip downgrade to 'chunk' is accelerator-only); explicit
    values pass through untouched."""
    args = preset(parse_args(_base_argv(tmp_path)))
    assert args.loop_impl == "scan"
    args = preset(parse_args(_base_argv(tmp_path, **{
        "--model_name": "stabilityai/stable-diffusion-xl-base-1.0",
        "--performance_boosting_t": "0.0"})))
    assert args.loop_impl == "scan"  # cpu backend: no single-chip downgrade
    args = preset(parse_args(_base_argv(tmp_path, **{
        "--model_name": "stabilityai/stable-diffusion-xl-base-1.0",
        "--performance_boosting_t": "0.0", "--loop_impl": "chunk"})))
    assert args.loop_impl == "chunk"


def test_attn_impl_auto_resolves_to_ring_under_sp_mesh(tmp_path):
    """An 'sp' axis in --mesh_axes asks for sequence parallelism: 'auto'
    resolves to ring attention (on any backend); explicit impls win."""
    args = preset(parse_args(_base_argv(
        tmp_path, **{"--mesh_axes": "sp:4"})))
    assert args.attn_impl == "ring"
    args = preset(parse_args(_base_argv(
        tmp_path, **{"--mesh_axes": "dp:2, sp:4"})))  # whitespace-tolerant
    assert args.attn_impl == "ring"
    args = preset(parse_args(_base_argv(
        tmp_path, **{"--mesh_axes": "dp:2,sp:4", "--attn_impl": "xla"})))
    assert args.attn_impl == "xla"
    args = preset(parse_args(_base_argv(tmp_path)))
    assert args.attn_impl == "auto"  # cpu backend, no sp axis


def test_loop_impl_auto_sdxl_single_chip_downgrade(tmp_path, monkeypatch):
    """On a single accelerator chip, 'auto' downgrades to 'chunk' for SDXL
    (fused >~40-step 1024px programs fault); explicit 'scan' is honored
    (with a warning) so mesh/CPU users keep the fused program."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "devices", lambda *a: [object()])
    sdxl = {"--model_name": "stabilityai/stable-diffusion-xl-base-1.0",
            "--performance_boosting_t": "0.0", "--dtype": "bf16",
            "--attn_impl": "xla"}
    args = preset(parse_args(_base_argv(tmp_path, **sdxl)))
    assert args.loop_impl == "chunk"
    args = preset(parse_args(_base_argv(
        tmp_path, **{**sdxl, "--loop_impl": "scan"})))
    assert args.loop_impl == "scan"
