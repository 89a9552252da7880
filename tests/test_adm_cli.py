"""ADM-family CLI reachability (VERDICT r1 item 8): the checkpoint-era
model names the reference declares-but-refuses (define_argparser.py:163-168
raises NotImplementedError) route to the UNetADM port and run the uncond
experiment surface end-to-end, including learned-σ ε-slicing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.experiments import (
    EditUncondDiffusion,
    UncondExperimentConfig,
)
from diffusion_pullback_tpu.models import UNetADM, UNet2D, adm_tiny, model_for_name
from diffusion_pullback_tpu.ops import DiffusionSchedule
from diffusion_pullback_tpu.utils.config import parse_args, preset
from diffusion_pullback_tpu.utils.datasets import NoiseDataset
from diffusion_pullback_tpu.utils.logging import JSONLLogger


def test_model_for_name_routing():
    assert isinstance(model_for_name("CelebA_HQ_HF"), UNet2D)
    assert isinstance(model_for_name("LSUN_bedroom_HF"), UNet2D)
    m = model_for_name("FFHQ_P2")
    assert isinstance(m, UNetADM) and m.config.use_scale_shift_norm
    m = model_for_name("LSUN_cat")
    # LSUN_DICT (guided_diffusion/script_util.py:140-164): scale-shift norm
    # ON, attention at res 32/16/8 → downsample factors (8, 16, 32)
    assert isinstance(m, UNetADM) and m.config.use_scale_shift_norm
    assert m.config.attention_resolutions == (8, 16, 32)
    assert model_for_name("CIFAR10").config.image_size == 32
    with pytest.raises(ValueError, match="unknown uncond model_name"):
        model_for_name("WAT")


def test_preset_accepts_adm_names(tmp_path):
    argv = ["--note", "t", "--model_name", "FFHQ_P2", "--dataset_name",
            "noise", "--result_folder", str(tmp_path), "--for_steps", "100",
            "--performance_boosting_t", "0.2"]
    args = preset(parse_args(argv))
    assert args.is_adm and not args.is_stable_diffusion
    assert (args.c_in, args.image_size) == (3, 256)

    argv[3] = "CIFAR10"
    args = preset(parse_args(argv))
    assert args.is_adm and args.image_size == 32


@pytest.mark.slow
def test_adm_driver_end_to_end(tmp_path):
    """Tiny learned-σ ADM through the full uncond experiment driver:
    inversion → pullback → guidance edit → PNGs."""
    cfg = UncondExperimentConfig(
        for_steps=8, inv_steps=8, edit_t=0.6, pca_rank=4,
        pullback_min_iter=2, pullback_max_iter=4,
        x_space_guidance_num_step=2, vis_num=2, vis_num_pc=1,
        result_folder=str(tmp_path / "runs"),
        obs_folder=str(tmp_path / "obs"),
        basis_folder=str(tmp_path / "inputs"),
    )
    model = UNetADM(adm_tiny(16))  # learn_sigma=True in the tiny preset
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.float32(0.0)
    )
    drv = EditUncondDiffusion(
        model, params, DiffusionSchedule.linear(), NoiseDataset(16, n=2),
        cfg, logger=JSONLLogger(path=None, echo=False),
    )
    # ε-slicing: the sampler's eps has 3 channels even though the head has 6
    eps = drv.eps_fn(jnp.zeros((1, 16, 16, 3)), jnp.float32(100.0))
    assert eps.shape == (1, 16, 16, 3)

    names = drv.run_edit_local_encoder_pullback_xt(idx=0)
    assert len(names) == 2
    import os

    for n in names:
        assert os.path.exists(os.path.join(cfg.result_folder, n + ".png"))


@pytest.mark.slow
def test_adm_driver_classifier_guidance_and_respacing(tmp_path):
    """cond_fn hook + respaced grid through the driver: guided sampling on
    a 'ddim10'-style grid runs and differs from unguided (VERDICT r2
    Missing #2/#3 wiring)."""
    import dataclasses

    from diffusion_pullback_tpu.models import EncoderUNetADM, adm_encoder_tiny
    from diffusion_pullback_tpu.samplers import classifier_grad_fn

    cfg = UncondExperimentConfig(
        for_steps=8, inv_steps=8, edit_t=0.6, pca_rank=2,
        sampling_timesteps="ddim10",
        pullback_min_iter=2, pullback_max_iter=3,
        x_space_guidance_num_step=2, vis_num=2, vis_num_pc=1,
        result_folder=str(tmp_path / "runs"),
        obs_folder=str(tmp_path / "obs"),
        basis_folder=str(tmp_path / "inputs"),
    )
    model = UNetADM(adm_tiny(16))
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.float32(0.0)
    )
    drv = EditUncondDiffusion(
        model, params, DiffusionSchedule.linear(), NoiseDataset(16, n=2),
        cfg, logger=JSONLLogger(path=None, echo=False),
    )
    # respaced grid in effect: 10 retained steps → 9 forward pairs
    assert drv.fwd_grid.num_steps == 9
    # ddim10 → stride-100 grid {0,100,...,900}: starts at 900, not 999
    assert float(drv.fwd_grid.timesteps[0]) == 900.0

    plain = drv.run_ddim_forward(num_samples=2)

    clf = EncoderUNetADM(adm_encoder_tiny(16))
    cp = clf.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)),
                  jnp.float32(0.0))
    drv.cond_fn = classifier_grad_fn(
        lambda z, t: clf.apply(cp, z, t), jnp.asarray([3]), scale=5.0
    )
    drv._jit_cache.clear()
    guided = drv.run_ddim_forward(num_samples=2)
    assert guided.shape == plain.shape
    assert np.isfinite(np.asarray(guided)).all()
    assert np.abs(np.asarray(guided) - np.asarray(plain)).max() > 1e-6


def test_cli_classifier_flags_parse(tmp_path):
    argv = ["--note", "t", "--model_name", "FFHQ_P2", "--dataset_name",
            "noise", "--result_folder", str(tmp_path), "--for_steps", "100",
            "--performance_boosting_t", "0.2", "--classifier_scale", "2.5",
            "--classifier_label", "7", "--sampling_timesteps", "ddim25"]
    args = preset(parse_args(argv))
    assert args.classifier_scale == 2.5
    assert args.classifier_label == 7
    assert args.sampling_timesteps == "ddim25"
