"""Secondary uncond experiments: parallel transport, local-PCA edit,
decoder/x̂₀ pullbacks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.experiments import (
    EditUncondDiffusion,
    UncondExperimentConfig,
)
from diffusion_pullback_tpu.models import TapPoint, UNet2D, ddpm_tiny
from diffusion_pullback_tpu.ops import DiffusionSchedule
from diffusion_pullback_tpu.utils.datasets import NoiseDataset
from diffusion_pullback_tpu.utils.logging import JSONLLogger


pytestmark = pytest.mark.slow  # heavy e2e/oracle/mesh (make test-all)


@pytest.fixture()
def driver(tmp_path):
    cfg = UncondExperimentConfig(
        for_steps=6, inv_steps=6, edit_t=0.6, pca_rank=4,
        pullback_min_iter=2, pullback_max_iter=3,
        x_space_guidance_num_step=2, vis_num=2, vis_num_pc=1,
        result_folder=str(tmp_path / "runs"),
        obs_folder=str(tmp_path / "obs"),
        basis_folder=str(tmp_path / "inputs"),
    )
    model = UNet2D(ddpm_tiny(16))
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.float32(0.0))
    return EditUncondDiffusion(
        model, params, DiffusionSchedule.linear(), NoiseDataset(16, n=3), cfg,
        logger=JSONLLogger(path=None, echo=False),
    )


def test_parallel_transport_edit(driver):
    names = driver.run_edit_parallel_transport(
        sample_idx_0=0, sample_idx_1=1, pca_rank=4, vis_num=2, vis_num_pc=1
    )
    assert len(names) == 2
    for n in names:
        assert "0to1" in n
        assert os.path.exists(os.path.join(driver.cfg.result_folder, n + ".png"))


def test_local_pca_edit(driver):
    names = driver.run_edit_local_pca_xt(
        idx=2, pca_rank=3, num_samples=64, vis_num=2, vis_num_pc=1
    )
    assert len(names) == 2
    for n in names:
        assert os.path.exists(os.path.join(driver.cfg.result_folder, n + ".png"))


def test_decoder_and_x0_pullback(driver):
    xT = driver.run_ddim_inversion(0)
    xt = driver.forward_to_edit_t(xT)
    t = driver.fwd_grid.timesteps[driver.edit_t_idx]
    tap = TapPoint("mid", 0)
    res = driver.compute_local_decoder_basis(xt, t, tap, pca_rank=3)
    # h at mid for tiny config: 8x8x16 → dim 1024; eps-space u: 16*16*3
    assert res.vT.shape == (3, 8 * 8 * 16)
    assert res.u.shape == (16 * 16 * 3, 3)
    assert bool(jnp.all(res.s[:-1] >= res.s[1:]))  # descending
    res0 = driver.compute_local_decoder_basis(xt, t, tap, pca_rank=3,
                                              x0_pullback=True)
    assert res0.vT.shape == (3, 8 * 8 * 16)
    # Tweedie map scales ε by -sqrt(1-a)/sqrt(a): singular values scale too
    assert not np.allclose(np.asarray(res0.s), np.asarray(res.s))


def test_global_mean_edits(driver):
    names_f = driver.run_edit_global_frechet_mean_xt(
        idx=2, basis_indices=[0, 1], pca_rank=4, vis_num=2, vis_num_pc=1
    )
    assert len(names_f) == 2 and "global_frechet" in names_f[0]
    names_h = driver.run_edit_global_hungarian_mean_xt(
        idx=2, basis_indices=[0, 1], pca_rank=4, vis_num=2, vis_num_pc=1
    )
    assert len(names_h) == 2 and "global_hungarian" in names_h[0]
    for n in names_f + names_h:
        assert os.path.exists(os.path.join(driver.cfg.result_folder, n + ".png"))


def test_batched_harvest_matches_loop(driver):
    # enough iterations that both probe seeds converge to the same subspace
    driver.cfg.pullback_min_iter = 8
    driver.cfg.pullback_max_iter = 15
    driver._jit_cache.clear()
    out_b = driver.run_sample_encoder_local_tangent_space_xt_batched(
        idx=0, pca_rank=2, t_grid=(0.4, 0.8)
    )
    assert len(out_b) == 2
    # compare against the per-t loop (different probe init → same converged
    # subspace)
    import numpy as np
    from diffusion_pullback_tpu.experiments import basis_name

    for et in (0.4, 0.8):
        name = basis_name(driver.cfg.dataset_name, 0, et, "mid", 0, 0,
                          pca_rank=2)
        u_b, s_b, vT_b = driver.cache.load(name)
        t_idx = int(jnp.argmin(jnp.abs(driver.fwd_grid.timesteps - et * 1000.0)))
        xT = driver.run_ddim_inversion(0)
        from diffusion_pullback_tpu.samplers.ddim_loop import ddim_forward
        xt = ddim_forward(driver.eps_fn, xT, driver.schedule, driver.fwd_grid,
                          start_idx=0, end_idx=t_idx)
        res = driver.compute_local_basis(
            xt, driver.fwd_grid.timesteps[t_idx], TapPoint("mid", 0), 2
        )
        # compare the dominant triplet only: the tiny random net has a
        # clustered σ₂≈σ₃ tail, so higher directions are seed-sensitive
        np.testing.assert_allclose(abs(float(s_b[0])),
                                   abs(float(res.s[0])), rtol=2e-2)
        cos0 = abs(float(np.dot(vT_b[0], np.asarray(res.vT[0]))))
        assert cos0 > 0.99, cos0


def test_harvest_ablations(driver):
    """fix_xt / fix_t ablations (reference edit.py:1571-1578): fix_xt bases
    differ from the unablated ones at later t; fix_t likewise."""
    base = driver.run_sample_encoder_local_tangent_space_xt_batched(
        idx=0, pca_rank=2, t_grid=(0.4, 0.8)
    )
    fx = driver.run_sample_encoder_local_tangent_space_xt_batched(
        idx=0, pca_rank=2, t_grid=(0.4, 0.8), fix_xt=True
    )
    ft = driver.run_sample_encoder_local_tangent_space_xt_batched(
        idx=0, pca_rank=2, t_grid=(0.4, 0.8), fix_t=True
    )
    assert set(base.values()) != set(fx.values()) != set(ft.values())
    import numpy as np
    from diffusion_pullback_tpu.experiments import basis_name

    # at the later grid point (index 1 in t_grid ordering → t=0.8 differs
    # from the pinned first point t=0.4), the ablated basis must differ
    name_b = basis_name(driver.cfg.dataset_name, 0, 0.8, "mid", 0, 0,
                        pca_rank=2)
    _, s_b, _ = driver.cache.load(name_b)
    _, s_fx, _ = driver.cache.load(name_b + "-fix_xt")
    _, s_ft, _ = driver.cache.load(name_b + "-fix_t")
    assert not np.allclose(s_b, s_fx, rtol=1e-3)
    assert not np.allclose(s_b, s_ft, rtol=1e-3)


def test_psd_visualization(tmp_path):
    """Working spec of the reference's broken vis_psd path: PSD curves per
    trajectory frame; spectral ordering sanity on known signals."""
    import numpy as np

    from diffusion_pullback_tpu.experiments.vis import (
        radial_psd,
        vis_power_spectral_density,
    )

    rng = np.random.default_rng(0)
    # white noise: flat-ish spectrum; smooth image: low-frequency dominated
    noise = rng.normal(size=(16, 16, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:16, 0:16] / 16.0
    smooth = np.repeat((np.sin(2 * np.pi * yy))[..., None], 3, -1).astype(
        np.float32
    )
    p_noise, p_smooth = radial_psd(noise), radial_psd(smooth)
    # single-cycle sine: the fundamental (bin 1) carries everything
    assert p_smooth[1:3].sum() / max(p_smooth[1:].sum(), 1e-9) > 0.99
    assert p_noise[1:3].sum() / max(p_noise[1:].sum(), 1e-9) < 0.5

    out = str(tmp_path / "psd.png")
    curves = vis_power_spectral_density(
        [noise[None], smooth[None]], out
    )
    assert curves.shape[0] == 2
    import os

    assert os.path.exists(out)


def test_h_space_guidance_edit(tmp_path):
    """Working spec of the reference's undefined h_space_guidance
    (edit.py:1236): u_k-direction feature perturbations with a shared
    encoder pass, DDS micro-walk, boosted finish, PNGs."""
    import jax
    import jax.numpy as jnp

    from diffusion_pullback_tpu.experiments import (
        EditUncondDiffusion,
        UncondExperimentConfig,
    )
    from diffusion_pullback_tpu.models import UNet2D, ddpm_tiny
    from diffusion_pullback_tpu.ops import DiffusionSchedule
    from diffusion_pullback_tpu.utils.datasets import NoiseDataset
    from diffusion_pullback_tpu.utils.logging import JSONLLogger

    cfg = UncondExperimentConfig(
        for_steps=8, inv_steps=8, edit_t=0.6, pca_rank=4,
        pullback_min_iter=2, pullback_max_iter=4,
        x_space_guidance_num_step=3, vis_num=2, vis_num_pc=1,
        result_folder=str(tmp_path / "runs"),
        obs_folder=str(tmp_path / "obs"),
        basis_folder=str(tmp_path / "inputs"),
    )
    model = UNet2D(ddpm_tiny(16))
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.float32(0.0))
    drv = EditUncondDiffusion(
        model, params, DiffusionSchedule.linear(), NoiseDataset(16, n=2),
        cfg, logger=JSONLLogger(path=None, echo=False),
    )
    names = drv.run_edit_h_space_guidance(idx=0)
    assert len(names) == 2
    for n in names:
        assert os.path.exists(os.path.join(cfg.result_folder, n + ".png")), n
    # idempotent + shares the basis cache with the x-space experiment
    assert drv.run_edit_h_space_guidance(idx=0) == names


def test_inner_tap_pullback_edit(tmp_path):
    """--after_res / --after_sa intra-block taps (reference
    down_block_forward, utils.py:638-719) run the full pullback edit and
    cache under a distinct basis name."""
    import jax
    import jax.numpy as jnp

    from diffusion_pullback_tpu.experiments import (
        EditUncondDiffusion,
        UncondExperimentConfig,
    )
    from diffusion_pullback_tpu.models import UNet2D, ddpm_tiny
    from diffusion_pullback_tpu.ops import DiffusionSchedule
    from diffusion_pullback_tpu.utils.datasets import NoiseDataset
    from diffusion_pullback_tpu.utils.logging import JSONLLogger

    cfg = UncondExperimentConfig(
        for_steps=8, inv_steps=8, edit_t=0.6, pca_rank=4,
        pullback_min_iter=2, pullback_max_iter=4,
        x_space_guidance_num_step=2, vis_num=2, vis_num_pc=1,
        result_folder=str(tmp_path / "runs"),
        obs_folder=str(tmp_path / "obs"),
        basis_folder=str(tmp_path / "inputs"),
    )
    model = UNet2D(ddpm_tiny(16))
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.float32(0.0))
    drv = EditUncondDiffusion(
        model, params, DiffusionSchedule.linear(), NoiseDataset(16, n=2),
        cfg, logger=JSONLLogger(path=None, echo=False),
    )
    # after_res on down block 0 (plain); after_sa on block 1 (attn block)
    n1 = drv.run_edit_local_encoder_pullback_xt(
        idx=0, op="down", block_idx=0, after_res=True)
    n2 = drv.run_edit_local_encoder_pullback_xt(
        idx=0, op="down", block_idx=1, after_sa=True)
    assert n1 != n2 and len(n1) == 2 and len(n2) == 2
    cached = os.listdir(cfg.basis_folder)
    assert any("after_res0" in c for c in cached)
    assert any("after_attn0" in c for c in cached)


def test_pullback_models_flash_pair_selection(driver, tmp_path):
    """A flash-primal model (no forward-mode rule) must map the linearized
    pullback onto the custom_jvp/custom_vjp kernel pair; models without a
    switchable attention (UNet2D) are a no-op even under the accelerator
    default pullback_attn_impl='flash'."""
    # UNet2D: no attn_impl on the config → nothing to pair
    driver.cfg.pullback_attn_impl = "flash"
    assert driver._pullback_models() == (driver.model, None)

    # ADM: switchable attention → the fused pair
    from diffusion_pullback_tpu.models import UNetADM, adm_tiny

    m = UNetADM(adm_tiny(16))
    p = m.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
               jnp.float32(0.0))
    import dataclasses

    cfg = dataclasses.replace(
        driver.cfg, pullback_attn_impl="flash",
        result_folder=str(tmp_path / "ar"), obs_folder=str(tmp_path / "ao"),
        basis_folder=str(tmp_path / "ai"),
    )
    from diffusion_pullback_tpu.experiments import EditUncondDiffusion
    from diffusion_pullback_tpu.models.unet2d import TapPoint
    from diffusion_pullback_tpu.ops import DiffusionSchedule
    from diffusion_pullback_tpu.utils.datasets import NoiseDataset
    from diffusion_pullback_tpu.utils.logging import JSONLLogger

    d = EditUncondDiffusion(m, p, DiffusionSchedule.linear(),
                            NoiseDataset(16, n=1), cfg,
                            logger=JSONLLogger(path=None, echo=False))
    m_jvp, m_vjp = d._pullback_models()
    assert m_jvp.config.attn_impl == "flash_jvp"
    assert m_vjp.config.attn_impl == "flash"
    # at tiny sequence lengths every impl falls back to XLA inside
    # attention(), so the pair must reproduce the xla numerics exactly
    xt = jnp.asarray(d.dataset[0])
    t = d.fwd_grid.timesteps[d.edit_t_idx]
    r_pair = d.compute_local_basis(xt, t, TapPoint("mid", 0), 2)
    d.cfg.pullback_attn_impl = ""
    d._jit_cache.clear()
    r_base = d.compute_local_basis(xt, t, TapPoint("mid", 0), 2)
    np.testing.assert_allclose(np.asarray(r_pair.s), np.asarray(r_base.s),
                               rtol=1e-5)
