"""End-to-end uncond experiment on a tiny model: inversion → pullback basis
(cached) → ±pc x-space-guidance edit → PNGs, with idempotent re-runs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.experiments import (
    BasisCache,
    EditUncondDiffusion,
    UncondExperimentConfig,
    basis_name,
)
from diffusion_pullback_tpu.models import UNet2D, ddpm_tiny
from diffusion_pullback_tpu.ops import DiffusionSchedule
from diffusion_pullback_tpu.utils.datasets import NoiseDataset
from diffusion_pullback_tpu.utils.logging import JSONLLogger


@pytest.fixture()
def driver(tmp_path):
    cfg = UncondExperimentConfig(
        for_steps=8,
        inv_steps=8,
        edit_t=0.6,
        pca_rank=4,
        pullback_min_iter=2,
        pullback_max_iter=4,
        x_space_guidance_num_step=3,
        vis_num=2,
        vis_num_pc=1,
        result_folder=str(tmp_path / "runs"),
        obs_folder=str(tmp_path / "obs"),
        basis_folder=str(tmp_path / "inputs"),
    )
    model = UNet2D(ddpm_tiny(16))
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.float32(0.0)
    )
    ds = NoiseDataset(16, n=2)
    log = JSONLLogger(path=None, echo=False)
    return EditUncondDiffusion(
        model, params, DiffusionSchedule.linear(), ds, cfg, logger=log
    )


def test_end_to_end_edit(driver):
    names = driver.run_edit_local_encoder_pullback_xt(idx=0)
    assert len(names) == 2  # 1 pc × ±
    for n in names:
        p = os.path.join(driver.cfg.result_folder, n + ".png")
        assert os.path.exists(p), p
    # basis cached
    name = basis_name(driver.cfg.dataset_name, 0, driver.cfg.edit_t, "mid",
                      0, 0, pca_rank=driver.cfg.pca_rank)
    assert driver.cache.load(name) is not None
    # second run is a no-op (PNG idempotency, reference edit.py:285-288)
    names2 = driver.run_edit_local_encoder_pullback_xt(idx=0)
    assert names2 == names


def test_basis_cache_roundtrip(tmp_path):
    c = BasisCache(str(tmp_path))
    u = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32)
    s = np.arange(4, dtype=np.float32)
    vT = np.random.default_rng(1).normal(size=(4, 16)).astype(np.float32)
    assert c.load("missing") is None
    c.save("b", u, s, vT)
    u2, s2, vT2 = c.load("b")
    np.testing.assert_array_equal(u, u2)
    np.testing.assert_array_equal(s, s2)
    np.testing.assert_array_equal(vT, vT2)


def test_forward_smoke(driver, tmp_path):
    out = driver.run_ddim_forward(num_samples=2, save_as=str(tmp_path / "g.png"))
    assert out.shape == (2, 16, 16, 3)
    assert os.path.exists(tmp_path / "g.png")


@pytest.mark.slow
def test_tangent_space_harvest(driver):
    saved = driver.run_sample_encoder_local_tangent_space_xt(
        idx=1, pca_rank=2, t_grid=(0.4, 0.8)
    )
    assert len(saved) == 2
    for p in saved.values():
        assert os.path.exists(p)


@pytest.mark.slow
def test_decoder_pullback_edit(driver):
    """Decoder-sensitivity directions pulled to x via encoder Jᵀ → edit PNGs
    (completes the reference's undispatched decoder-pullback flags)."""
    names = driver.run_edit_local_decoder_pullback_xt(
        idx=0, pca_rank=2, vis_num=2, vis_num_pc=1
    )
    assert len(names) == 2
    for n in names:
        assert os.path.exists(
            os.path.join(driver.cfg.result_folder, n + ".png")
        ), n
    # Tweedie x0-map variant
    names_x0 = driver.run_edit_local_decoder_pullback_xt(
        idx=0, pca_rank=2, vis_num=2, vis_num_pc=1, x0_pullback=True
    )
    assert names_x0 != names


@pytest.mark.slow
def test_global_pca_edit(driver):
    """Population h-PCA directions → Jᵀ → guidance edit (reference
    global_pca_zt flag, declared but never dispatched)."""
    names = driver.run_edit_global_pca_xt(
        idx=0, num_samples=4, pca_rank=2, vis_num=2, vis_num_pc=1
    )
    assert len(names) == 2
    for n in names:
        assert os.path.exists(
            os.path.join(driver.cfg.result_folder, n + ".png")
        ), n


def test_basis_name_rank_qualifier():
    """r=2 edit bases and r=50 analysis bases must not shadow each other
    (the reference separates them via pca_rank_{r} save dirs, edit.py:220)."""
    a = basis_name("d", 0, 0.7, "mid", 0, 0, pca_rank=2)
    b = basis_name("d", 0, 0.7, "mid", 0, 0, pca_rank=50)
    assert a != b and a.endswith("-pca_rank_2")
    assert basis_name("d", 0, 0.7, "mid", 0, 0) + "-pca_rank_2" == a


def test_classifier_guidance_qualifies_cache_key(driver):
    """With a cond_fn set, every trajectory visits different latents, so
    cached bases must carry the guidance setting in their key."""
    from diffusion_pullback_tpu.models.unet2d import TapPoint

    tap = TapPoint("mid", 0)
    assert driver._basis_name_extras(tap) == ""
    driver.cfg.classifier_scale = 2.5
    driver.cfg.classifier_label = 7
    driver.cond_fn = lambda x, t: jnp.zeros_like(x)
    extras = driver._basis_name_extras(tap)
    assert "clsg2.5" in extras and "y7" in extras
    driver.cond_fn = None
