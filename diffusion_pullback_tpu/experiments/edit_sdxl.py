"""Stable-Diffusion-XL editing experiments (dual-tower latent pullback).

SDXL flavour of `EditStableDiffusion` — the reference's pipeline family
(/root/reference/src/modules/edit.py:31-535 is written against the SD1/SD2
HF pipelines; SDXL is its BASELINE config-5 scale target). Differences from
the SD driver, all confined to the prompt/conditioning plumbing:

  - two text towers: CLIP ViT-L (768) and OpenCLIP bigG (1280), each read at
    the penultimate hidden layer; their concatenation (2048) is the U-Net
    cross-attention context.
  - the bigG tower additionally yields the pooled/projected text embedding,
    which together with the (orig_size, crop, target_size) time_ids feeds the
    U-Net's addition-embeds path (models/unet2d_condition.py:_embed).
  - VAE scaling_factor 0.13025 (vs 0.18215) — carried by the VAE config.

Every prompt embedding is the pytree ``(context, pooled)``; it flows through
the same jit argument paths as the SD driver's single array, so all parent
pipelines (inversion, forward, pullback, guidance, harvest) are inherited
unchanged — only `_get_emb`, `eps_with` and `_tap_encode` are overridden.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.clip_text import CLIPTextModel, load_tokenizer
from ..models.unet2d import TapPoint
from ..models.unet2d_condition import UNet2DCondition
from ..models.vae import AutoencoderKL
from ..ops.schedule import DiffusionSchedule
from ..utils.logging import JSONLLogger
from .cache import BasisCache
from .edit_sd import EditStableDiffusion, SDExperimentConfig


class EditStableDiffusionXL(EditStableDiffusion):
    def __init__(
        self,
        unet: UNet2DCondition,
        unet_params,
        vae: AutoencoderKL,
        vae_params,
        text_model_1: CLIPTextModel,
        text_params_1,
        text_model_2: CLIPTextModel,
        text_params_2,
        schedule: DiffusionSchedule,
        dataset,
        config: SDExperimentConfig,
        tokenizer_1=None,
        tokenizer_2=None,
        logger: Optional[JSONLLogger] = None,
    ):
        self.text_model_1, self.text_params_1 = text_model_1, text_params_1
        self.text_model_2, self.text_params_2 = text_model_2, text_params_2
        self.tokenizer_1 = tokenizer_1 or load_tokenizer(text_model_1.config)
        self.tokenizer_2 = tokenizer_2 or load_tokenizer(text_model_2.config)
        # micro-conditioning: original size == target size, no crop — the
        # "clean generation" time_ids SDXL pipelines use by default
        side = float(unet.config.sample_size * 8)
        self._time_ids = jnp.asarray(
            [[side, side, 0.0, 0.0, side, side]], jnp.float32
        )
        super().__init__(
            unet, unet_params, vae, vae_params,
            # parent keeps these for API symmetry; XL paths use the pair above
            text_model_1, text_params_1,
            schedule, dataset, config,
            tokenizer=self.tokenizer_1, logger=logger,
        )

    # ---- prompt / tap hooks -------------------------------------------------

    def _get_emb(self, prompt: str):
        """Prompt → ((B, 77, 2048) context, (B, 1280) pooled) pytree."""
        if not hasattr(self, "_embed_jit_xl"):
            def embed(tp1, tp2, ids1, ids2):
                h1 = self.text_model_1.apply(tp1, ids1, penultimate=True)
                h2, pooled = self.text_model_2.apply(
                    tp2, ids2, return_pooled=True, penultimate=True
                )
                return jnp.concatenate([h1, h2], axis=-1), pooled

            self._embed_jit_xl = jax.jit(embed)
        return self._embed_jit_xl(
            self.text_params_1, self.text_params_2,
            jnp.asarray(self.tokenizer_1([prompt])),
            jnp.asarray(self.tokenizer_2([prompt])),
        )

    def _added(self, pooled, b):
        return (
            jnp.broadcast_to(pooled, (b,) + pooled.shape[1:]),
            jnp.broadcast_to(self._time_ids, (b, 6)),
        )

    def _tap_encode(self, params, z, t, prompt_emb, tap: TapPoint, unet=None):
        ctx, pooled = prompt_emb
        return (unet or self.unet).apply(
            params, z, t, ctx, tap,
            added_cond=self._added(pooled, z.shape[0]),
            method=UNet2DCondition.encode,
        )

    def _tap_encode_with_state(self, params, z, t, prompt_emb, tap: TapPoint,
                               unet=None):
        """SDXL flavour: dual-tower context + pooled addition embeddings
        (the base-class decoder-pullback/PCA experiments route through these
        hooks, so they work unchanged on SDXL)."""
        ctx, pooled = prompt_emb
        return (unet or self.unet).apply(
            params, z, t, ctx, tap,
            added_cond=self._added(pooled, z.shape[0]),
            method=UNet2DCondition.encode_with_state,
        )

    def _shallow_encode(self, p, z, t, prompt_emb):
        ctx, pooled = prompt_emb
        return self.unet.apply(
            p, z, t, jnp.broadcast_to(ctx, (z.shape[0],) + ctx.shape[1:]),
            added_cond=self._added(pooled, z.shape[0]),
            method=UNet2DCondition.shallow_encode,
        )

    def _finish_forward(self, p, sel, for_emb, neg_emb):
        """SDXL flavour of the edit-tail finish: unpack the (context,
        pooled) pytrees and feed the addition-embeds path; DeepCache when
        ``edit_deepcache_interval`` > 1, exact otherwise."""
        itv = self.cfg.edit_deepcache_interval
        if itv <= 1:
            from ..samplers.ddim_loop import ddim_forward

            return ddim_forward(
                self.eps_with(p, for_emb, neg_emb), sel, self.schedule,
                self.fwd_grid, start_idx=self.edit_t_idx,
            )
        from ..samplers.deepcache import ddim_forward_deepcache_cond

        ctx, pooled = for_emb
        b = sel.shape[0]
        cfg_on = neg_emb is not None and self.cfg.guidance_scale > 1.0
        neg_ctx = neg_added = None
        if cfg_on:
            nc, np_ = neg_emb
            neg_ctx, neg_added = nc, self._added(np_, b)
        return ddim_forward_deepcache_cond(
            self.unet, p, sel, ctx, self.schedule, self.fwd_grid,
            interval=itv, start_idx=self.edit_t_idx,
            added_cond=self._added(pooled, b),
            neg_context=neg_ctx, neg_added_cond=neg_added,
            guidance_scale=self.cfg.guidance_scale if cfg_on else 0.0,
        )

    # ---- eps ----------------------------------------------------------------

    def eps_with(self, params, prompt_emb, cfg_neg_emb=None):
        """ε(z, t) with SDXL conditioning; CFG fuses [neg; for] rows with
        their pooled embeddings into one 2·B batch (same shape discipline as
        the SD driver — reference edit.py:446-463)."""
        scale = self.cfg.guidance_scale
        ctx, pooled = prompt_emb

        if cfg_neg_emb is None or scale <= 1.0:
            def fn(z, t):
                b = z.shape[0]
                c = jnp.broadcast_to(ctx, (b,) + ctx.shape[1:])
                return self.unet.apply(
                    params, z, t, c, added_cond=self._added(pooled, b)
                )
            return fn

        neg_ctx, neg_pooled = cfg_neg_emb

        def fn(z, t):
            b = z.shape[0]
            zz = jnp.concatenate([z, z], axis=0)
            cc = jnp.concatenate(
                [
                    jnp.broadcast_to(neg_ctx, (b,) + neg_ctx.shape[1:]),
                    jnp.broadcast_to(ctx, (b,) + ctx.shape[1:]),
                ],
                axis=0,
            )
            pp = jnp.concatenate(
                [
                    jnp.broadcast_to(neg_pooled, (b,) + neg_pooled.shape[1:]),
                    jnp.broadcast_to(pooled, (b,) + pooled.shape[1:]),
                ],
                axis=0,
            )
            tids = jnp.broadcast_to(self._time_ids, (2 * b, 6))
            eps = self.unet.apply(
                params, zz, t, cc, added_cond=(pp, tids)
            )
            e_un, e_c = jnp.split(eps, 2, axis=0)
            return e_un + scale * (e_c - e_un)

        return fn
