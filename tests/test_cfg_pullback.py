"""CFG-inside-JVP pullback (VERDICT r1 item 7 / BASELINE config 4).

The reference's CFG pullback path crashes (edit.py:399 reads memory_bound
before assignment), so this is the working spec: with
pullback_guidance_scale = s > 0 the differentiated encoder is
h_edit + s·(h_edit − h_neg), computed as one fused 2·B batch. s = 0 must
reproduce the edit-prompt-only bases exactly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pullback_tpu.experiments import (
    EditStableDiffusion,
    SDExperimentConfig,
)
from diffusion_pullback_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DCondition,
    clip_text_tiny,
    sd_tiny_unet,
    vae_tiny,
)
from diffusion_pullback_tpu.models.unet2d import TapPoint
from diffusion_pullback_tpu.ops import DiffusionSchedule
from diffusion_pullback_tpu.utils.datasets import NoiseDataset
from diffusion_pullback_tpu.utils.logging import JSONLLogger


pytestmark = pytest.mark.slow  # heavy e2e/oracle/mesh (make test-all)


def _driver(tmp_path, tag, **cfg_over):
    ucfg = dataclasses.replace(sd_tiny_unet(8), cross_attention_dim=16)
    tcfg = dataclasses.replace(clip_text_tiny(), hidden_size=16)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vae_tiny(16))
    text = CLIPTextModel(tcfg)
    up = unet.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                   jnp.float32(0.0), jnp.zeros((1, tcfg.max_length, 16)))
    vp = vae.init(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))
    tp = text.init(jax.random.key(2),
                   jnp.zeros((1, tcfg.max_length), jnp.int32))
    cfg = SDExperimentConfig(
        dataset_name="noise", for_steps=8, inv_steps=8, edit_t=0.6,
        edit_prompt="a test prompt", neg_prompt="ugly", pca_rank=4,
        pullback_min_iter=2, pullback_max_iter=3,
        x_space_guidance_num_step=2, vis_num=2, vis_num_pc=1,
        result_folder=str(tmp_path / f"runs{tag}"),
        obs_folder=str(tmp_path / f"obs{tag}"),
        basis_folder=str(tmp_path / f"inputs{tag}"),
        **cfg_over,
    )
    return EditStableDiffusion(
        unet, up, vae, vp, text, tp,
        DiffusionSchedule.scaled_linear(), NoiseDataset(16, n=2), cfg,
        logger=JSONLLogger(path=None, echo=False),
    )


def test_zero_scale_reproduces_plain_bases(tmp_path):
    d0 = _driver(tmp_path, "0")
    d1 = _driver(tmp_path, "1", pullback_guidance_scale=0.0)
    zt = jax.random.normal(jax.random.key(5), (1, 8, 8, 4))
    t = d0.fwd_grid.timesteps[d0.edit_t_idx]
    r0 = d0.compute_local_basis(zt, t, TapPoint("mid", 0), 4)
    r1 = d1.compute_local_basis(zt, t, TapPoint("mid", 0), 4)
    np.testing.assert_array_equal(np.asarray(r0.s), np.asarray(r1.s))
    np.testing.assert_array_equal(np.asarray(r0.vT), np.asarray(r1.vT))


def test_cfg_encoder_matches_two_pass_combination(tmp_path):
    """The fused 2·B CFG encoder equals (1+s)·h_edit − s·h_neg computed as
    two separate tap encodes."""
    s = 2.5
    d = _driver(tmp_path, "c", pullback_guidance_scale=s)
    tap = TapPoint("mid", 0)
    enc, _, _ = d._pullback_tap_encoders(tap)
    fused = d._cfg_encoder(enc)
    zt = jax.random.normal(jax.random.key(6), (1, 8, 8, 4))
    t = d.fwd_grid.timesteps[d.edit_t_idx]
    h_fused = fused(d.unet_params, zt, t,
                    (d.edit_prompt_emb, d.neg_prompt_emb))
    h_e = enc(d.unet_params, zt, t, d.edit_prompt_emb)
    h_n = enc(d.unet_params, zt, t, d.neg_prompt_emb)
    np.testing.assert_allclose(
        np.asarray(h_fused), np.asarray((1 + s) * h_e - s * h_n),
        atol=1e-5,
    )


def test_cfg_pullback_runs_and_differs(tmp_path):
    s = 2.5
    d0 = _driver(tmp_path, "0")
    dc = _driver(tmp_path, "g", pullback_guidance_scale=s)
    zt = jax.random.normal(jax.random.key(7), (1, 8, 8, 4))
    t = d0.fwd_grid.timesteps[d0.edit_t_idx]
    r0 = d0.compute_local_basis(zt, t, TapPoint("mid", 0), 4)
    rc = dc.compute_local_basis(zt, t, TapPoint("mid", 0), 4)
    assert rc.s.shape == r0.s.shape
    assert not np.allclose(np.asarray(rc.s), np.asarray(r0.s))


def test_cfg_scale_qualifies_basis_cache_name(tmp_path):
    """Review-finding regression: bases computed under CFG-inside-JVP must
    not shadow (or be shadowed by) plain bases in the on-disk cache."""
    from diffusion_pullback_tpu.models.unet2d import TapPoint

    d0 = _driver(tmp_path, "p0")
    dc = _driver(tmp_path, "pc", pullback_guidance_scale=2.5)
    tap = TapPoint("mid", 0)
    assert d0._basis_name_extras(tap) == ""
    assert "cfg2.5" in dc._basis_name_extras(tap)
