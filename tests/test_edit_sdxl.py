"""End-to-end SDXL experiment on tiny configs: dual-tower prompt embed →
VAE encode → inversion → pullback (addition-embeds conditioning) → edit →
decode → PNGs. Mirrors tests/test_edit_sd_e2e.py for the XL driver."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.experiments import (
    EditStableDiffusionXL,
    SDExperimentConfig,
)
from diffusion_pullback_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DCondition,
    clip_text_tiny,
    sdxl_tiny_unet,
    vae_tiny,
)
from diffusion_pullback_tpu.ops import DiffusionSchedule
from diffusion_pullback_tpu.utils.datasets import NoiseDataset
from diffusion_pullback_tpu.utils.logging import JSONLLogger


pytestmark = pytest.mark.slow  # heavy e2e/oracle/mesh (make test-all)


@pytest.fixture()
def xl_driver(tmp_path):
    # sdxl_tiny_unet: context 16 (= two towers of 8), addition_embed_dim 8
    ucfg = sdxl_tiny_unet(8)
    tcfg = dataclasses.replace(clip_text_tiny(), hidden_size=8,
                               intermediate_size=16)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(
        dataclasses.replace(vae_tiny(16), scaling_factor=0.13025)
    )
    t1, t2 = CLIPTextModel(tcfg), CLIPTextModel(tcfg)

    z0 = jnp.zeros((1, 8, 8, 4))
    ctx0 = jnp.zeros((1, tcfg.max_length, 16))
    added0 = (jnp.zeros((1, 8)), jnp.zeros((1, 6)))
    ids0 = jnp.zeros((1, tcfg.max_length), jnp.int32)

    up = unet.init(jax.random.key(0), z0, jnp.float32(0.0), ctx0,
                   added_cond=added0)
    vp = vae.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
    tp1 = t1.init(jax.random.key(2), ids0, return_pooled=True,
                  penultimate=True)
    tp2 = t2.init(jax.random.key(3), ids0, return_pooled=True,
                  penultimate=True)

    cfg = SDExperimentConfig(
        dataset_name="noise",
        for_steps=8,
        inv_steps=8,
        edit_t=0.6,
        edit_prompt="a test prompt",
        pca_rank=4,
        pullback_min_iter=2,
        pullback_max_iter=3,
        x_space_guidance_num_step=3,
        vis_num=2,
        vis_num_pc=1,
        result_folder=str(tmp_path / "runs"),
        obs_folder=str(tmp_path / "obs"),
        basis_folder=str(tmp_path / "inputs"),
    )
    return EditStableDiffusionXL(
        unet, up, vae, vp, t1, tp1, t2, tp2,
        DiffusionSchedule.scaled_linear(), NoiseDataset(16, n=2), cfg,
        logger=JSONLLogger(path=None, echo=False),
    )


def test_xl_prompt_embedding_shapes(xl_driver):
    ctx, pooled = xl_driver.edit_prompt_emb
    # two 8-wide towers concatenated + bigG-tower pooled feature
    assert ctx.shape == (1, 8, 16)
    assert pooled.shape == (1, 8)
    # distinct prompts → distinct embeddings (hash tokenizer determinism)
    ctx2, _ = xl_driver._get_emb("another prompt entirely")
    assert not np.allclose(np.asarray(ctx), np.asarray(ctx2))


def test_xl_end_to_end_edit(xl_driver):
    names = xl_driver.run_edit_local_encoder_pullback_zt(idx=0)
    assert len(names) == 2
    for n in names:
        assert os.path.exists(
            os.path.join(xl_driver.cfg.result_folder, n + ".png")
        ), n
    # idempotent rerun
    assert xl_driver.run_edit_local_encoder_pullback_zt(idx=0) == names


def test_xl_forward_and_cfg(xl_driver, tmp_path):
    x0 = xl_driver.run_DDIMforward(num_samples=2,
                                   save_as=str(tmp_path / "f.png"))
    assert x0.shape == (2, 16, 16, 3)
    # CFG path fuses [neg; for] with pooled embeds into one 2·B batch
    xl_driver.cfg.guidance_scale = 3.0
    eps = xl_driver.eps_with(
        xl_driver.unet_params, xl_driver.for_prompt_emb,
        xl_driver.neg_prompt_emb,
    )
    out = jax.jit(eps)(jnp.zeros((2, 8, 8, 4)), jnp.float32(100.0))
    assert out.shape == (2, 8, 8, 4)


def test_xl_penultimate_differs_from_final(xl_driver):
    """The towers are read at the penultimate layer (HF hidden_states[-2],
    no final LN) — must differ from the final normalized hidden states."""
    ids = jnp.asarray(xl_driver.tokenizer_1(["same prompt"]))
    final = xl_driver.text_model_1.apply(xl_driver.text_params_1, ids)
    penult = xl_driver.text_model_1.apply(
        xl_driver.text_params_1, ids, penultimate=True
    )
    assert final.shape == penult.shape
    assert not np.allclose(np.asarray(final), np.asarray(penult))


def test_xl_decoder_pullback_edit(xl_driver):
    """Review-finding regression: the SDXL driver inherits the SD decoder
    pullback; its _tap_encode_with_state override must thread the pooled
    addition embeddings (a missing override crashed with 'added_cond'
    ValueError)."""
    names = xl_driver.run_edit_local_decoder_pullback_zt(
        idx=0, op="mid", block_idx=0, pca_rank=2, vis_num=2, vis_num_pc=1,
    )
    assert len(names) == 2
    for n in names:
        assert os.path.exists(
            os.path.join(xl_driver.cfg.result_folder, n + ".png")
        ), n


def test_xl_edit_tail_deepcache_interval1_matches_plain(xl_driver):
    """SDXL _finish_forward override: interval=1 ≡ plain finish (added-cond
    plumbed through the DeepCache sampler); interval=3 runs finite. Also
    checked with CFG on (fused 2·B rows + dual added conds)."""
    zt = jax.random.normal(jax.random.key(7), (2, 8, 8, 4))
    p = xl_driver.unet_params
    fe, ne = xl_driver.for_prompt_emb, xl_driver.neg_prompt_emb

    for gs in (0.0, 3.0):
        xl_driver.cfg.guidance_scale = gs
        xl_driver.cfg.edit_deepcache_interval = 0
        plain = xl_driver._finish_forward(p, zt, fe, ne)
        xl_driver.cfg.edit_deepcache_interval = 1
        dc1 = xl_driver._finish_forward(p, zt, fe, ne)
        np.testing.assert_allclose(np.asarray(dc1), np.asarray(plain),
                                   rtol=1e-4, atol=1e-5)
        xl_driver.cfg.edit_deepcache_interval = 3
        dc3 = xl_driver._finish_forward(p, zt, fe, ne)
        assert np.isfinite(np.asarray(dc3)).all()
    xl_driver.cfg.edit_deepcache_interval = 0
    xl_driver.cfg.guidance_scale = 0.0


def test_xl_chunk_loop_matches_scan(xl_driver):
    """loop_impl='chunk' inherits cleanly in the XL driver: the chunked
    traversals thread the (ctx, pooled) tuple embeddings and the chunked
    DeepCache finish threads the added-cond overrides. Parity vs fused,
    remainder chunk included (8 steps / chunk 3)."""
    z_scan = xl_driver.run_DDIMinversion(idx=0)
    xl_driver.cfg.loop_impl = "chunk"
    xl_driver.cfg.loop_chunk = 3
    xl_driver._jit_cache.clear()
    z_chunk = xl_driver.run_DDIMinversion(idx=0)
    np.testing.assert_allclose(np.asarray(z_chunk), np.asarray(z_scan),
                               rtol=2e-4, atol=1e-5)

    zt = jax.random.normal(jax.random.key(11), (2, 8, 8, 4))
    p = xl_driver.unet_params
    fe, ne = xl_driver.for_prompt_emb, xl_driver.neg_prompt_emb
    xl_driver.cfg.loop_impl = "scan"
    xl_driver.cfg.edit_deepcache_interval = 3
    fused = xl_driver._finish_forward(p, zt, fe, ne)
    xl_driver.cfg.loop_impl = "chunk"
    chunked = xl_driver._finish_forward_host(zt)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(fused),
                               rtol=2e-4, atol=1e-5)
    xl_driver.cfg.loop_impl = "scan"
    xl_driver.cfg.edit_deepcache_interval = 0


def test_xl_guidance_deepcache_walk(xl_driver):
    """The DeepCache micro-walk routes through the SDXL hook overrides
    (_tap_encode_with_state/_shallow_encode with added conds): interval=1
    is exact vs the plain fused walk."""
    zt = jax.random.normal(jax.random.key(23), (1, 8, 8, 4))
    vk = jax.random.normal(jax.random.key(24), (8, 8, 4))
    t_edit = xl_driver.fwd_grid.timesteps[xl_driver.edit_t_idx]
    p, ee = xl_driver.unet_params, xl_driver.edit_prompt_emb

    xl_driver.cfg.guidance_deepcache_interval = 0
    plain = xl_driver._guidance_walk(p, ee, zt, vk, t_edit)
    xl_driver.cfg.guidance_deepcache_interval = 1
    exact = xl_driver._guidance_walk(p, ee, zt, vk, t_edit)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(plain),
                               rtol=2e-4, atol=1e-5)
    xl_driver.cfg.guidance_deepcache_interval = 3
    dc3 = xl_driver._guidance_walk(p, ee, zt, vk, t_edit)
    assert np.isfinite(np.asarray(dc3)).all()
    xl_driver.cfg.guidance_deepcache_interval = 0
